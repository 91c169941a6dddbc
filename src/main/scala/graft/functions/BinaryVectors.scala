package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
