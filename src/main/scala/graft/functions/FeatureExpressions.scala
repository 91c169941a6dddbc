package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd kernels for hashed-feature (fasttext-style) text models. */
object FeatureExpressions {

  /** Σ over token hashes h of `weights[floorMod(h, weights.length)]` — the
    * w·x dot product of a hashed bag-of-tokens WITHOUT materializing the
    * count vector: the feature map (hash → bucket) and the dot product fuse
    * into one compiled loop over the token-hash array. */
  def bucketWeightSum(tokenHashes: Column, weights: Array[Double]): Column =
    GraftColumnBridge.column(
      BucketWeightSumExpr(GraftColumnBridge.expression(tokenHashes), weights))
}

/** See [[FeatureExpressions.bucketWeightSum]]. The weights ride along as a
  * codegen reference object (dim doubles — the same bounded shape as the
  * k-means center literals); left-to-right accumulation keeps eval and
  * codegen bit-identical. */
case class BucketWeightSumExpr(child: Expression, weights: Array[Double])
  extends UnaryExpression {

  require(weights.nonEmpty, "bucket_weight_sum needs a non-empty weight vector")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long>, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "bucket_weight_sum"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var acc = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      acc += weights(java.lang.Math.floorMod(arr.getLong(i), weights.length.toLong).toInt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val wRef = ctx.addReferenceObj("weights", weights, "double[]")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |double $acc = 0.0;
         |int $n = $v.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $wRef[(int) java.lang.Math.floorMod($v.getLong($i), ${weights.length}L)];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BucketWeightSumExpr =
    copy(child = newChild)
}
