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

  /** Fused hashing-trick embedding kernel — tokenize → portable hash →
    * bucket count → L2 normalize in ONE pass per row (see
    * [[graft.functions.TextFunctions.hashedTokenEmbedding]] for the
    * contract; this is its execution engine). The HOF formulation of the
    * same math allocated a fresh dim-array per TOKEN inside the
    * interpreted aggregate-transform fold — 144 s for 208k chunks at the
    * 30× probe; this kernel is the measured fix. */
  def hashedBowEmbed(text: Column, dim: Int): Column =
    GraftColumnBridge.column(
      HashedBowEmbedExpr(GraftColumnBridge.expression(text), dim))
}

/** See [[FeatureExpressions.hashedBowEmbed]]. Bit-identical to the HOF
  * reference formulation (parity-spec'd): counts accumulate in doubles,
  * the squared-norm sums buckets in index order, every component divides
  * by the same double sqrt. CodegenFallback like the other string kernels
  * — eval is one tight loop, no per-token allocation. */
case class HashedBowEmbedExpr(child: Expression, dim: Int)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(dim > 0, "hashed_bow_embed needs dim > 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "hashed_bow_embed"

  /** Single whitespace char test — exactly the `\s` class Java's regex
    * uses without UNICODE_CHARACTER_CLASS: [ \t\n\x0B\f\r]. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val counts = new Array[Double](dim)
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString.trim
    // r19: one manual scan over the trimmed chars instead of
    // split("\\s+") — the split compiled its regex AND allocated a token
    // String per word ON EVERY ROW of the chunk table (the hottest map of
    // q_chunk_embed). Token boundaries are maximal `\s` runs exactly as
    // the regex defined them (all of \s is BMP, so the char-level test
    // is equivalent); each token's codepoints fold incrementally and the
    // bucket increments at the boundary — same hashes, zero per-token
    // allocation.
    if (s.nonEmpty) {
      var h = 0L
      var inTok = false
      var ci = 0
      while (ci < s.length) {
        val c = s.charAt(ci)
        if (isWs(c)) {
          if (inTok) {
            counts(java.lang.Math.floorMod(h, dim.toLong).toInt) += 1.0
            inTok = false
          }
          ci += 1
        } else {
          if (!inTok) { h = 0L; inTok = true }
          val cp = s.codePointAt(ci)
          h = (h * HashExpressions.B + cp) % HashExpressions.P
          ci += Character.charCount(cp)
        }
      }
      if (inTok) counts(java.lang.Math.floorMod(h, dim.toLong).toInt) += 1.0
    }
    var norm2 = 0.0
    var j = 0
    while (j < dim) { norm2 += counts(j) * counts(j); j += 1 }
    if (norm2 > 0) {
      val norm = java.lang.Math.sqrt(norm2)
      j = 0
      while (j < dim) { counts(j) /= norm; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBowEmbedExpr =
    copy(child = newChild)
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
