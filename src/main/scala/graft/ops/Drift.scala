package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring: Population Stability Index between a
  * reference sample and a current sample of one numeric column — the
  * standard "did the data shift under me" check run between crawls,
  * between a source store and its migrated target, or between training
  * epochs. (Rule of thumb: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
  * shifted.) Complements [[graft.ops.TextAnalysis.tokenKlDivergence]]
  * (token distributions) with the numeric-feature face.
  *
  * Bin edges are fixed-width over the REFERENCE side's [min, max] —
  * derived in-plan from a broadcast 1-row aggregate (no collect), with
  * out-of-range current values clamped into the edge bins, the standard
  * convention that makes new-data outliers visible as edge-bin mass.
  *
  * Scale shape: one pruned scan + one tiny agg per side, a broadcast of
  * the 1-row stats, and a `bins`-row join — nothing driver-side, nothing
  * quadratic. All the math up to the final `ln` is exact fractions of
  * counts; each PSI term is rounded to 6 dp, so a SQL oracle reproduces
  * the table bit-for-bit.
  */
object Drift {

  /** Per-bin PSI table: bin index, both probability masses (6 dp), and
    * the PSI term (6 dp). `sum(psi_term)` is the headline PSI.
    *
    * @param epsilon floor applied to each side's mass before the ratio,
    *                the usual guard against empty-bin infinities.
    */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String, bins: Int = 10,
          epsilon: Double = 1e-6): DataFrame = {
    require(bins > 0, "bins > 0")
    val v = col(valueCol).cast("double")
    val stats = ref.filter(v.isNotNull)
      .agg(min(v).as("__min"), max(v).as("__max"))

    def binned(df: DataFrame, side: String) = df
      .filter(v.isNotNull)
      .crossJoin(broadcast(stats))
      .select(least(greatest(
        // constant reference: the ref's single point sits in the MIDDLE
        // bin; current values BELOW it land in bin 0, ABOVE in the last
        // bin. (Mapping everything to one bin here made an arbitrarily
        // large shift against a constant reference report PSI = 0.)
        when(col("__max") === col("__min"),
          when(v < col("__min"), 0).when(v > col("__max"), bins - 1)
            .otherwise(bins / 2))
          .otherwise(floor((v - col("__min")) / ((col("__max") - col("__min")) / bins)))
          .cast("int"),
        lit(0)), lit(bins - 1)).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(s"n_$side"))

    val refBins = binned(ref, "ref")
    val curBins = binned(cur, "cur")
    // bins with zero mass on one side still get a row (epsilon floor)
    val spine = ref.sparkSession.range(bins).select(col("id").cast("int").as("bin"))
    val nRef = sum(col("n_ref")).over()
    val nCur = sum(col("n_cur")).over()
    spine
      .join(refBins, Seq("bin"), "left_outer")
      .join(curBins, Seq("bin"), "left_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .select(col("bin"),
        (col("n_ref") / nRef).as("__p"),
        (col("n_cur") / nCur).as("__q"))
      .select(col("bin"),
        round(col("__p"), 6).as("p_ref"),
        round(col("__q"), 6).as("p_cur"),
        round((greatest(col("__q"), lit(epsilon)) - greatest(col("__p"), lit(epsilon))) *
          log(greatest(col("__q"), lit(epsilon)) / greatest(col("__p"), lit(epsilon))), 6)
          .as("psi_term"))
      .orderBy("bin")
  }
}
