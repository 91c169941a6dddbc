package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze & Schmid 2011: "Product
  * Quantization for Nearest Neighbor Search").
  *
  * A d-dim vector splits into `m` contiguous subvectors of d/m dims; each
  * subvector is vector-quantized against its own small codebook (ksub
  * centroids, trained with the existing distributed k-means —
  * [[graft.ops.Quantization.pqTrain]]). A vector then stores m SMALL ints
  * instead of d floats — the memory format that lets a 100 TB embedding
  * collection fit a cluster's RAM (64-dim float32 = 256 B → m=8 codes = 8 B,
  * 32×) — and asymmetric distance (ADC) scores a query against a code in
  * O(m) table lookups instead of O(d) multiplies.
  *
  * Codebooks ride into codegen as reference objects — the same
  * bounded-driver-collect shape as [[NearestCenterExpr]] and the IVF cell
  * literals (m·ksub·dsub doubles, e.g. 8·256·8 = 16k — nothing).
  */
object PqExpressions {

  /** struct(codes array<int>, recon_err double): per-subspace nearest
    * codeword indexes + the l2 reconstruction error — see [[PqEncodeExpr]]. */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqEncodeExpr(GraftColumnBridge.expression(v), codebooks))

  /** Asymmetric PQ distance via a per-query lookup table — see
    * [[PqAdcLookupExpr]]. */
  def pqAdcDistance(codes: Column, queryIdx: Column,
                    tables: Array[Array[Array[Double]]]): Column =
    GraftColumnBridge.column(PqAdcLookupExpr(
      GraftColumnBridge.expression(codes), GraftColumnBridge.expression(queryIdx), tables))
}

/** v → struct(codes, recon_err): codes[s] = argmin_c l2²(v[s·dsub ..],
  * codebooks(s)(c)) with ties to the LOWEST code (same determinism rule as
  * [[NearestCenterExpr]]); recon_err = sqrt(Σ_s best l2²) — the exact l2
  * distance between v and its PQ reconstruction, computed for free from the
  * per-subspace argmin accumulators. One compiled loop per row: encoding is
  * a full-collection scan at build time, the PQ hot path. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
  extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "pq_encode needs at least one codeword per subspace")

  private val m = codebooks.length
  private val dsub = codebooks(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${other.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_err", DoubleType, nullable = false)))
  override def prettyName: String = "pq_encode"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val codes = new Array[Int](m)
    var total = 0.0
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val base = s * dsub
      var best = 0
      var bestAcc = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        val lim = math.min(dsub, n - base)
        var acc = 0.0
        var i = 0
        while (i < lim) {
          val d = (if (isFloat) v.getFloat(base + i).toDouble else v.getDouble(base + i)) - cw(i)
          acc += d * d
          i += 1
        }
        if (acc < bestAcc) { bestAcc = acc; best = c }
        c += 1
      }
      codes(s) = best
      total += bestAcc
      s += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(codes), math.sqrt(total)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val total = ctx.freshName("total")
      val s = ctx.freshName("s")
      val cb = ctx.freshName("cb")
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestAcc = ctx.freshName("bestAcc")
      val c = ctx.freshName("c")
      val cw = ctx.freshName("cw")
      val lim = ctx.freshName("lim")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val get = if (isFloat) s"(double) $v.getFloat($base + $i)" else s"$v.getDouble($base + $i)"
      s"""
         |int $n = $v.numElements();
         |int[] $codes = new int[$m];
         |double $total = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  double[][] $cb = $cbRef[$s];
         |  int $base = $s * $dsub;
         |  int $best = 0;
         |  double $bestAcc = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cb.length; $c++) {
         |    double[] $cw = $cb[$c];
         |    int $lim = Math.min($dsub, $n - $base);
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $lim; $i++) {
         |      double $d = $get - $cw[$i];
         |      $acc += $d * $d;
         |    }
         |    if ($acc < $bestAcc) { $bestAcc = $acc; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |  $total += $bestAcc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes),
         |    Math.sqrt($total) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Asymmetric distance computation (ADC): dist(query, code) =
  * sqrt(Σ_s tables[q][s][codes[s]]) where tables[q][s][c] = l2²(query's
  * s-th subvector, codeword c) was precomputed ONCE per query on the driver
  * (queries are few and broadcast — the same contract as brute-force top-k).
  * Scoring a candidate is then m array lookups — independent of the vector
  * dimension, and the codes column it reads is ~32× narrower than the
  * original floats: the scan-bandwidth shape that makes exhaustive ANN over
  * a quantized 100 TB collection feasible. */
case class PqAdcLookupExpr(left: Expression, right: Expression,
                           tables: Array[Array[Array[Double]]])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType | LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, int), got ${l.simpleString}, ${r.simpleString}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_distance"

  private def isLongIdx = right.dataType == LongType

  override def nullSafeEval(codesAny: Any, idxAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val q = if (isLongIdx) idxAny.asInstanceOf[Long].toInt else idxAny.asInstanceOf[Int]
    val t = tables(q)
    val m = math.min(codes.numElements(), t.length)
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += t(s)(codes.getInt(s))
      s += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, idx) => {
      val tRef = ctx.addReferenceObj("pqTables", tables, "double[][][]")
      val t = ctx.freshName("t")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val cast = if (isLongIdx) s"(int) $idx" else idx
      s"""
         |double[][] $t = $tRef[$cast];
         |int $m = Math.min($codes.numElements(), $t.length);
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  $acc += $t[$s][$codes.getInt($s)];
         |}
         |${ev.value} = Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdcLookupExpr =
    copy(left = newLeft, right = newRight)
}
