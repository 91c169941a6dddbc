package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dense-vector kernels. Semantics are IDENTICAL to the
  * higher-order-function forms in [[VectorFunctions]] (cast each element to
  * double, accumulate left-to-right), so DuckDB oracles keep matching
  * bit-for-bit — but the loop is compiled, which is what makes
  * all-pairs/top-k scoring viable when the candidate set is 100 TB, not an
  * interpreted lambda per element.
  *
  * op ∈ dot | cosine | l2. Inputs: array<float> or array<double>.
  */
object VectorExpressions {
  def dot(a: Column, b: Column): Column = make(a, b, VectorKernel.Dot)
  def cosine(a: Column, b: Column): Column = make(a, b, VectorKernel.Cosine)
  def l2(a: Column, b: Column): Column = make(a, b, VectorKernel.L2)

  private def make(a: Column, b: Column, op: Int): Column =
    GraftColumnBridge.column(VectorKernel(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), op))
}

case class VectorKernel(left: Expression, right: Expression, op: Int)
  extends BinaryExpression {

  import VectorKernel._

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = op match {
    case Dot => "vec_dot"
    case Cosine => "vec_cosine"
    case L2 => "vec_l2"
  }

  private def isFloatL = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def isFloatR = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (isFloatL) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (isFloatR) y.getFloat(i).toDouble else y.getDouble(i)
      op match {
        case Dot => dot += xi * yi
        case Cosine => dot += xi * yi; na += xi * xi; nb += yi * yi
        case L2 => dot += (xi - yi) * (xi - yi)
      }
      i += 1
    }
    op match {
      case Dot => dot
      case L2 => math.sqrt(dot)
      case Cosine =>
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) 0.0 else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (isFloatL) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloatR) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val accum = op match {
        case Dot => s"$dot += $xi * $yi;"
        case Cosine => s"$dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;"
        case L2 => s"$dot += ($xi - $yi) * ($xi - $yi);"
      }
      val finish = op match {
        case Dot => s"${ev.value} = $dot;"
        case L2 => s"${ev.value} = Math.sqrt($dot);"
        case Cosine =>
          s"""double denom = Math.sqrt($na) * Math.sqrt($nb);
             |${ev.value} = (denom == 0.0) ? 0.0 : $dot / denom;""".stripMargin
      }
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $getX;
         |  double $yi = $getY;
         |  $accum
         |}
         |$finish
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorKernel =
    copy(left = newLeft, right = newRight)
}

object VectorKernel {
  val Dot = 0
  val Cosine = 1
  val L2 = 2
}
