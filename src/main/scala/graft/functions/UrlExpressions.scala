package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass URL canonicalization kernel — the compiled twin of
  * [[graft.ops.Urls.canonicalizeUrlColumns]]'s column chain. The chain is
  * a dozen regexp/array passes with an intermediate string per stage; at
  * crawl scale (billions of URLs) that is the hot path, so this kernel
  * does ONE index-based walk per URL with a single precompiled pattern
  * (the tracking-param match). `UrlsSpec` differential-tests the two
  * faces over a combinatorial URL population — they must agree byte for
  * byte on every input. Cited parity decisions:
  *  - fragment/query split on FIRST '#'/'?' (index semantics, matching
  *    the chain's `substring_index`);
  *  - lowercase via [[UTF8String.toLowerCase]] itself, so Unicode hosts
  *    lower-case exactly as Spark's `lower()` does;
  *  - parameter sort in UTF8 BINARY order (Spark's `array_sort`), not
  *    UTF-16 `String.compareTo` — the two differ above the BMP.
  */
object UrlKernel extends Serializable {

  private val Tracking =
    java.util.regex.Pattern.compile("(?i)^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid)(=|$)")

  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** Index just past "://" when the string starts with a scheme, else -1. */
  private def schemeEnd(u: String): Int = {
    if (u.isEmpty) return -1
    val c0 = u.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return -1
    var i = 1
    while (i < u.length && {
      val c = u.charAt(i)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
    }) i += 1
    if (i + 2 < u.length + 1 && u.regionMatches(i, "://", 0, 3)) i + 3 else -1
  }

  private def lower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  // Spark's array_sort compares strings as UTF8 bytes (unsigned).
  // A named serializable class, not a lambda: the kernel rides the plan
  // to executors as a codegen reference object.
  private object Utf8Order extends java.util.Comparator[String] with Serializable {
    override def compare(a: String, b: String): Int =
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
  }

  def canonicalize(raw: String): String = {
    if (raw == null) return null
    val u0 = trimSpaces(raw)
    val hashIdx = u0.indexOf('#')
    val u = if (hashIdx >= 0) u0.substring(0, hashIdx) else u0
    val si = schemeEnd(u)
    if (si < 0) return u0 // non-URL: trimmed passthrough, fragment intact
    val scheme = lower(u.substring(0, si - 3))
    var he = si
    while (he < u.length && u.charAt(he) != '/' && u.charAt(he) != '?') he += 1
    // userinfo (through the LAST '@' of the authority, RFC 3986 §3.2) is
    // case-SENSITIVE credentials — preserved verbatim; only the host part
    // is lowercased (§6.2.2.1 covers scheme and host alone)
    val auth = u.substring(si, he)
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    var hostport = lower(auth.substring(at + 1))
    if (scheme == "http" && hostport.endsWith(":80"))
      hostport = hostport.substring(0, hostport.length - 3)
    else if (scheme == "https" && hostport.endsWith(":443"))
      hostport = hostport.substring(0, hostport.length - 4)
    val pathQs = u.substring(he)
    val qIdx = pathQs.indexOf('?')
    val path0 = if (qIdx >= 0) pathQs.substring(0, qIdx) else pathQs
    val path = if (path0.isEmpty) "/" else path0
    val query = if (qIdx >= 0) pathQs.substring(qIdx + 1) else ""
    val params = query.split("&", -1)
      .filter(p => p.nonEmpty && !Tracking.matcher(p).find())
    java.util.Arrays.sort(params, Utf8Order)
    val sb = new java.lang.StringBuilder(u.length + 1)
    sb.append(scheme).append("://").append(userinfo).append(hostport).append(path)
    if (params.nonEmpty) {
      sb.append('?')
      var i = 0
      while (i < params.length) {
        if (i > 0) sb.append('&')
        sb.append(params(i)); i += 1
      }
    }
    sb.toString
  }
}

/** `url_canonicalize(string) -> string` — see [[UrlKernel]]. */
case class UrlCanonicalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonicalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UrlKernel.canonicalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val k = ctx.addReferenceObj("urlKernel", UrlKernel, UrlKernel.getClass.getName)
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$k.canonicalize($c.toString()));"
    })

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalizeExpr =
    copy(child = newChild)
}
