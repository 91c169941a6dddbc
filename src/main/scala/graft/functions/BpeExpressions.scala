package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Kernels for the byte-pair-encoding tokenizer ([[graft.ops.Bpe]]).
  *
  * Both are CodegenFallback on the [[PortableTokenHashesExpr]] precedent:
  * per-row boxing is noise next to the per-element interpretation of the
  * HOF chains they replace, and string-array outputs don't benefit from
  * straight-line codegen the way the numeric kernels do.
  */
object BpeExpressions {

  /** word → its code-point characters + the `</w>` end-of-word marker —
    * the symbol alphabet BPE training starts from. Code-POINT iteration
    * (not UTF-16 units), matching the SQL oracle's character indexing. */
  def charSymbols(word: Column): Column =
    GraftColumnBridge.column(CharSymbolsExpr(GraftColumnBridge.expression(word)))

  /** text → BPE subword tokens: whitespace-split, lowercase, symbolize,
    * then apply the learned merges in rank order. */
  def bpeEncode(text: Column, merges: Array[(String, String)]): Column =
    GraftColumnBridge.column(BpeEncodeExpr(GraftColumnBridge.expression(text), merges))

  /** Locale.ROOT lowercase — the SAME fold [[BpeEncodeExpr]] applies, so
    * the trainer's symbolization and the encoder's agree on any host
    * locale. Spark's `lower()` delegates to the JVM DEFAULT locale for
    * non-ASCII strings (UTF8String.toLowerCaseSlow), so a tr_TR host
    * would train merges over 'ı' symbols the ROOT-folding encoder never
    * produces — breaking the documented train/encode round trip. */
  def lowerRoot(text: Column): Column =
    GraftColumnBridge.column(LowerRootExpr(GraftColumnBridge.expression(text)))
}

/** See [[BpeExpressions.lowerRoot]]. Codegen'd (not CodegenFallback): it
  * now sits under every corpus tokenize (BM25, vocabulary, perplexity,
  * fingerprints), and a fallback expression there would break the scan's
  * whole-stage codegen span. */
case class LowerRootExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "lower_root"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      input.asInstanceOf[UTF8String].toString.toLowerCase(java.util.Locale.ROOT))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString($c.toString().toLowerCase(java.util.Locale.ROOT))")

  override protected def withNewChildInternal(newChild: Expression): LowerRootExpr =
    copy(child = newChild)
}

/** See [[BpeExpressions.charSymbols]]. */
case class CharSymbolsExpr(child: Expression)
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_symbols"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += UTF8String.fromString(new String(Character.toChars(cp)))
      i += Character.charCount(cp)
    }
    out += UTF8String.fromString(graft.ops.Bpe.EndOfWord)
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): CharSymbolsExpr =
    copy(child = newChild)
}

/** See [[BpeExpressions.bpeEncode]]: the corpus-side encode pass. Merges
  * apply in learned-rank order (the Sennrich reference semantics), each
  * merging its occurrences leftmost-first — identical to the trainer's
  * merge step, so encoding the training corpus reproduces the trainer's
  * final symbolization. */
case class BpeEncodeExpr(child: Expression, merges: Array[(String, String)])
  extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.trim.toLowerCase(java.util.Locale.ROOT)
    if (text.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    HashExpressions.WS.split(text).foreach { w => // shared compiled pattern (r19)
      var syms = {
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          b += new String(Character.toChars(cp))
          i += Character.charCount(cp)
        }
        b += graft.ops.Bpe.EndOfWord
        b.toVector
      }
      merges.foreach { case (a, b) =>
        if (syms.length > 1) syms = graft.ops.BpeMerge(syms, a, b)
      }
      syms.foreach(s => out += UTF8String.fromString(s))
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
