package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram kernel (r20).
  *
  * The Column-level formulation
  * `transform(sequence(0, count-1), i -> concat_ws(" ", slice(toks, i+1, n)))`
  * re-evaluates the ENTIRE `toks` subtree — trim, regex split, per-token
  * lower — INSIDE the per-window lambda (a lambda body's non-lambda-bound
  * subtrees are evaluated per element; subexpression elimination cannot
  * hoist across the lambda boundary), making every document O(len²):
  * q_text_repetition at sf0.1 document lengths ran a single task for
  * >25 minutes before this kernel (killed, thread dump pinned the stack
  * in StringSplit under ArrayTransform→ConcatWs→ArrayTransform).
  *
  * Byte-exactness with the old formulation is BY CONSTRUCTION: the same
  * engine primitives in the same order — `UTF8String.trim` (SQL trim),
  * the shared compiled `\s+` pattern (String.split(regex) ≡
  * Pattern.compile(regex).split), `UTF8String.toLowerCase` per token (SQL
  * lower), `UTF8String.concatWs` for the window join (SQL concat_ws), and
  * first-occurrence dedup (SQL array_distinct) — each applied ONCE per
  * token/window instead of once per (window × token). Property-pinned
  * against the old Column formula in NgramKernelSpec.
  */
case class WordNgramsExpr(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression with CodegenFallback {

  require(n > 0, s"ngram size must be positive: $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  // containsNull = true matches the OLD Column formulation's merged type
  // (`array().cast("array<string>")` parses with nullable elements), so
  // downstream schemas — exploded columns, dumped parquet — are unchanged.
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  // NULL text maps to the EMPTY ARRAY (the tokens() null guard), so this
  // expression is null-tolerant: override eval, not nullSafeEval.
  override def nullable: Boolean = false
  override def prettyName: String = if (distinct) "word_shingles" else "word_ngrams"

  private val Empty = new GenericArrayData(Array.empty[Any])
  @transient private lazy val Space = UTF8String.fromString(" ")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val raw = child.eval(input).asInstanceOf[UTF8String]
    if (raw == null) return Empty
    val trimmed = raw.trim()
    if (trimmed.numBytes() == 0) return Empty
    val parts = HashExpressions.WS.split(trimmed.toString, -1)
    if (parts.length < n) return Empty
    val toks = new Array[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      toks(i) = UTF8String.fromString(parts(i)).toLowerCase
      i += 1
    }
    val nWin = toks.length - n + 1
    if (!distinct) {
      val out = new Array[Any](nWin)
      var w = 0
      while (w < nWin) {
        out(w) = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, w, w + n): _*)
        w += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var w = 0
      while (w < nWin) {
        seen.add(UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, w, w + n): _*))
        w += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}
