package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * At 100 TB the scan you DON'T run is the fastest one. Range-partitioning
  * by a single column gives parquet min/max pruning on that column only; a
  * query filtering on two columns still reads every file along the other
  * axis. Interleaving the bits of several columns into one Z-value and
  * range-sorting by it makes every file a small hyper-rectangle in the
  * combined key space, so min/max footer stats prune files for filters on
  * ANY prefix-free subset of the clustered columns — the `OPTIMIZE ZORDER
  * BY` layout of the lakehouse engines, built here from plain Catalyst
  * expressions (static bit unroll → whole-stage codegen; no UDF).
  *
  * Everything is integer math — min/scale bucketing, shift/and/or
  * interleave — so a SQL oracle reproduces the Z-values bit-for-bit.
  *
  * The reference has no layout machinery (it copies rows in input order);
  * this is an engine-side extension for the 100 TB write path.
  */
object Layout {

  /** Interleave the low `bits` bits of the already-bucketed non-negative
    * int columns: result bit `i*k + c` = bit `i` of column `c`. The unroll
    * is static (bits×k shift/and/shift terms), all core expressions —
    * whole-stage codegen compiles it to straight-line long ops. */
  def interleaveBits(buckets: Seq[Column], bits: Int): Column = {
    require(bits > 0, s"bits must be positive: $bits") // 0 -> empty.reduce
    require(buckets.nonEmpty && bits * buckets.size <= 62,
      s"${buckets.size} cols x $bits bits must fit a positive long")
    val k = buckets.size
    val terms = for {
      i <- 0 until bits
      (b, c) <- buckets.zipWithIndex
    } yield shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), i * k + c)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucket an integer column into [0, 2^bits) with pure int math:
    * `(x - min) DIV scale` where `scale = (max - min) DIV (2^bits - 1) + 1`
    * (integer DIV, not `/` — double division would round above 2^53). */
  def intBucket(x: Column, minV: Column, maxV: Column, bits: Int): Column = {
    val m = (1L << bits) - 1
    val div = (a: Column, b: Column) => org.apache.spark.sql.GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
    // max − min wraps NEGATIVE when the column spans more than 2^63 (a
    // hash-valued column covering [Long.Min, Long.Max]); a wrapped range
    // would make scale/buckets garbage and the z-order silently lose all
    // locality — fail loudly instead (x − min is then safe: x ∈
    // [min, max] ⇒ x − min ∈ [0, range])
    val range = maxV.cast("long") - minV.cast("long")
    val safeRange = when(range >= 0, range).otherwise(raise_error(lit(
      "intBucket: column range exceeds Long.MaxValue (max - min " +
        "overflowed) - z-order layout columns must span < 2^63; " +
        "pre-reduce the column (e.g. shiftrightunsigned) first")).cast("long"))
    val scale = div(safeRange, lit(m)) + 1
    div(x.cast("long") - minV.cast("long"), scale)
  }

  /** Z-value per row for the given integer columns: one 1-row global
    * min/max aggregate (broadcast back in-plan — no collect), bucket, and
    * interleave. Appended as `zCol`. */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16,
                 zCol: String = "z_value"): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"__min_$c"), max(col(c)).cast("long").as(s"__max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(stats))
    val buckets = cols.map(c =>
      intBucket(col(c), col(s"__min_$c"), col(s"__max_$c"), bits))
    joined
      .withColumn(zCol, interleaveBits(buckets, bits))
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c")): _*)
  }

  /** The write-path layout operator: range-partition + sort by the Z-value
    * so each output file covers a tight hyper-rectangle of the clustered
    * columns. Follow with `.write.parquet(...)`: footer min/max stats on
    * the clustered columns then prune files for conjunctive range filters
    * on any subset of them. */
  def zorder(df: DataFrame, cols: Seq[String], numPartitions: Int,
             bits: Int = 16): DataFrame = {
    val z = withZValue(df, cols, bits)
    z.repartitionByRange(numPartitions, col("z_value"))
      .sortWithinPartitions("z_value")
      .drop("z_value")
  }

  /** Similarity-clustered layout for an EMBEDDING collection: the sort key
    * is the random-hyperplane bucket ([[Similarity]]'s LSH geometry), so
    * cosine-similar vectors co-locate in output partitions/files. What it
    * buys at scale: a vector-store bulk load streams near-neighbors
    * together (HNSW/IVF builders insert locally instead of thrashing), and
    * a parquet lake gets file-level locality for downstream
    * `lshCosinePairs`-style blocked scans. Rows without a vector sort
    * first (null bucket), preserved. */
  def clusterBySimilarity(df: DataFrame, bits: Int = 8,
                          vecCol: String = "vector", dim: Int = -1,
                          numPartitions: Int = 0): DataFrame = {
    val planes = Similarity.hyperplanes(bits, Similarity.resolveDim(df, vecCol, dim))
    val withBucket = df.withColumn("__bucket", Similarity.bucketExpr(vecCol, planes))
    // numPartitions = 0 lets AQE right-size the range shuffle; an explicit
    // count pins the physical layout (e.g. matching a sink's shard count)
    val ranged =
      if (numPartitions > 0) withBucket.repartitionByRange(numPartitions, col("__bucket"))
      else withBucket.repartitionByRange(col("__bucket"))
    ranged.sortWithinPartitions("__bucket").drop("__bucket")
  }

  /** Source-interleaved write order for training shards: rank rows within
    * each source by their portable id hash, then range-sort by (rank,
    * source) — consecutive output rows cycle through the sources, so a
    * sequentially-read shard never feeds a training run a long run of one
    * source (the data-loader mixing property that a groupBy-shuffled
    * write destroys). Deterministic (pure function of ids), third member
    * of the write-layout family next to [[zorder]] (filter locality) and
    * [[clusterBySimilarity]] (similarity locality).
    *
    * The per-source rank window is bounded by that source's row count on
    * one side of a hash-shuffle — the standard window shape, not a global
    * sort; the final ordering is a range repartition.
    *
    * @return input rows + `interleave_rank`, range-sorted by
    *         (interleave_rank, source). ALL input rows: a null source is
    *         its own stratum (window partitions treat nulls as one group),
    *         never dropped — this is a WRITE-path operator and silently
    *         losing unattributed rows would corrupt the shards; a null id
    *         raises (no deterministic rank exists for it).
    */
  def interleaveBySource(df: DataFrame, sourceCol: String, idCol: String,
                         numPartitions: Int = 0, seed: Long = 42L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(sourceCol)
      .orderBy(Sampling.portableBucket(col(idCol), seed), col(idCol))
    val ranked = df
      .withColumn("interleave_rank",
        when(col(idCol).isNotNull, row_number().over(w))
          .otherwise(raise_error(lit(
            s"interleaveBySource: null '$idCol' has no deterministic " +
              "rank - filter or fill ids first")).cast("int")))
    val ranged =
      if (numPartitions > 0)
        ranked.repartitionByRange(numPartitions, col("interleave_rank"), col(sourceCol))
      else ranked.repartitionByRange(col("interleave_rank"), col(sourceCol))
    ranged.sortWithinPartitions("interleave_rank", sourceCol)
  }
}
