package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary-vector support: the reference's Milvus adapter handles
  * `BINARY_VECTOR` fields alongside floats (`adapters/milvus.py:82`).
  * Here: sign-bit packing of a dense float vector into `binary` (bit i set
  * iff v[i] > 0, LSB-first per byte — the Milvus/faiss byte layout) and
  * Hamming distance between packed vectors. Compact storage (dim/8 bytes)
  * plus cheap distance — the binary-embedding retrieval pattern.
  */
object BinaryVectors {
  def pack(v: Column): Column =
    GraftColumnBridge.column(PackBitsExpr(GraftColumnBridge.expression(v)))

  def hamming(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      BinaryHammingExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Sign bits packed into 32-bit words (as array<bigint>) — the
    * SQL-portable twin of [[pack]]; see [[SignBitsWordsExpr]]. */
  def signBitsWords(v: Column): Column =
    GraftColumnBridge.column(SignBitsWordsExpr(GraftColumnBridge.expression(v)))

  /** Hamming distance between two word arrays from [[signBitsWords]]. */
  def wordsHamming(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      WordsHammingExpr(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Sign-bit quantization into 32-bit words held in an array<bigint>:
  * bit k of word w is set iff v[32·w + k] > 0 — the same bit order as
  * [[PackBitsExpr]]'s LSB-first bytes, just wider lanes. 32 bits per word
  * (not 64) keeps every value in [0, 2^32): positive in int64 everywhere,
  * so a SQL oracle can rebuild the words with plain shifts and sums without
  * tripping over the sign bit. This is the 32× storage format behind
  * Hamming-distance retrieval: at 100 TB the packed collection is ~3 TB and
  * a distance is a handful of XOR+popcounts. Codegen'd — this is a
  * full-collection scan kernel. */
case class SignBitsWordsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_bits_words"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long]((n + 31) / 32)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (x > 0) out(i >> 5) |= (1L << (i & 31))
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $arr.getFloat" else s"$arr.getDouble"
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[($n + 31) / 32];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $get($i);
         |  if ($x > 0) $out[$i >> 5] |= (1L << ($i & 31));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBitsWordsExpr =
    copy(child = newChild)
}

/** Hamming distance between two [[SignBitsWordsExpr]] word arrays:
  * Σ popcount(a[i] XOR b[i]). Ragged inputs count surplus words fully,
  * matching [[BinaryHammingExpr]]. Codegen'd — this is the per-pair hot
  * loop of Hamming-distance retrieval. */
case class WordsHammingExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two array<bigint>, got " +
      s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "words_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val n = math.min(na, nb)
    var d = 0
    var i = 0
    while (i < n) { d += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    while (i < na) { d += java.lang.Long.bitCount(x.getLong(i)); i += 1 }
    i = n
    while (i < nb) { d += java.lang.Long.bitCount(y.getLong(i)); i += 1 }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = Math.min($na, $nb);
         |int $d = 0;
         |int $i = 0;
         |for (; $i < $n; $i++) { $d += Long.bitCount($a.getLong($i) ^ $b.getLong($i)); }
         |for (; $i < $na; $i++) { $d += Long.bitCount($a.getLong($i)); }
         |for ($i = $n; $i < $nb; $i++) { $d += Long.bitCount($b.getLong($i)); }
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): WordsHammingExpr =
    copy(left = newLeft, right = newRight)
}

case class PackBitsExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_bits"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (x > 0) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): PackBitsExpr =
    copy(child = newChild)
}

case class BinaryHammingExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary inputs")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "binary_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var d = 0
    var i = 0
    while (i < n) { d += Integer.bitCount((x(i) ^ y(i)) & 0xff); i += 1 }
    // length mismatch: surplus bytes count fully (vectors of equal dim
    // always match lengths; this keeps the metric total on ragged input)
    (n until x.length).foreach(i => d += Integer.bitCount(x(i) & 0xff))
    (n until y.length).foreach(i => d += Integer.bitCount(y(i) & 0xff))
    d
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): BinaryHammingExpr =
    copy(left = newLeft, right = newRight)
}
