package graft.connectors.vectorstore

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ArrayNode

/** Deterministic wire-protocol mismatch: the endpoint ANSWERED, but not in
  * the documented shape — a proxy error page, an API-version drift, a
  * load balancer's HTML 200. Distinct from a transient fault (retrying
  * replays the same wrong shape) and from a missing collection (the
  * caller's 404 contract): the retry layer must not burn attempts on it
  * ([[RetryingTransport.defaultRetryOn]]) and `describe` must not swallow
  * it into `None` ("collection absent" and "endpoint speaks a different
  * protocol" demand different operator responses). */
final class WireShapeException(msg: String) extends IllegalStateException(msg)

/** Shape-checked JSON walking for the wire dialects' response parsers —
  * the typed replacement for bare `.get(...).get(...)` chains, which
  * surface an unexpected response as a context-free NullPointerException
  * (or ClassCastException) deep inside schema inference. Every accessor
  * names the backend, the verb, and the full JSON path it expected, plus a
  * bounded snippet of what actually arrived:
  *
  * {{{
  * val sh = WireShape("qdrant", "describe", call("GET", path))
  * val v  = sh.down("result", "config", "params", "vectors")
  * CollectionConfig(distance = v.text("distance"), dim = v.int("size"))
  * // on drift: WireShapeException("unexpected describe response from
  * //   qdrant: missing 'result.config.params.vectors' (got: {...}")
  * }}}
  *
  * Shared by the three dialects' describe/stats/count/catalog parsers so
  * the error contract cannot desynchronize per backend.
  */
private[vectorstore] final class WireShape private (
    backend: String, verb: String, root: JsonNode,
    here: JsonNode, prefix: String) {

  def fail(detail: String): Nothing = {
    val s = String.valueOf(root)
    val snip = if (s.length > 300) s.take(300) + "…" else s
    throw new WireShapeException(
      s"unexpected $verb response from $backend: $detail (got: $snip)")
  }

  private def joined(path: Seq[String]): String = prefix + path.mkString(".")

  /** Walk `path`, requiring every step present and non-null. */
  def node(path: String*): JsonNode = {
    var n = here
    var walked = 0
    path.foreach { p =>
      val next = if (n == null) null else n.get(p)
      walked += 1
      if (next == null || next.isNull)
        fail(s"missing '${joined(path.take(walked))}'")
      n = next
    }
    n
  }

  /** Walk `path`; None when any step is absent/null (no error) — for
    * fields the real API documents as optional. */
  def opt(path: String*): Option[JsonNode] = {
    var n = here
    path.foreach { p =>
      val next = if (n == null) null else n.get(p)
      if (next == null || next.isNull) return None
      n = next
    }
    Option(n)
  }

  /** Context descended to `node(path)`, keeping backend/verb and
    * accumulating the path prefix for error messages. */
  def down(path: String*): WireShape =
    new WireShape(backend, verb, root, node(path: _*), joined(path) + ".")

  def arr(path: String*): ArrayNode = node(path: _*) match {
    case a: ArrayNode => a
    case other => fail(s"'${joined(path)}' is not an array: $other")
  }

  /** Integral only — a fractional number from a drifted endpoint must
    * raise the typed error, not silently truncate (`"size": 2.5` would
    * otherwise describe a wrong dim; same reject-don't-coerce rule as
    * the config parser's numeric fields). */
  def int(path: String*): Int = {
    val n = node(path: _*)
    if (n.isNumber && n.canConvertToExactIntegral && n.canConvertToInt) n.asInt()
    else if (n.isTextual && n.asText().toIntOption.isDefined) n.asText().toInt
    else fail(s"'${joined(path)}' is not an integer: $n")
  }

  def text(path: String*): String = {
    val n = node(path: _*)
    if (n.isValueNode) n.asText() // textual, number, boolean — never {}→""
    else fail(s"'${joined(path)}' is not a scalar: $n")
  }

  /** Float vector at `path` (required): shape-checked here for the
    * context-rich error, decoded by the ONE shared [[WireJson.floats]]. */
  def floats(path: String*): Array[Float] = {
    val n = node(path: _*)
    if (!n.isArray) fail(s"'${joined(path)}' is not a float array: $n")
    WireJson.floats(n)
  }

  /** Sub-context rooted at an ELEMENT of this response (an array member a
    * caller is iterating) — errors still carry backend/verb/root. */
  def at(n: JsonNode, label: String): WireShape =
    new WireShape(backend, verb, root, n, label + ".")
}

private[vectorstore] object WireShape {
  def apply(backend: String, verb: String, root: JsonNode): WireShape =
    new WireShape(backend, verb, root, root, "")
}
