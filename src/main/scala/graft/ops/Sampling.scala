package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling utilities for training-data mixtures.
  *
  * [[hashSample]] is DETERMINISTIC: membership depends only on the row's
  * id (xxhash64 bucket), not on partitioning or task scheduling — so
  * pipelines are reproducible across runs and cluster layouts, and the
  * sample is stable under repartitioning (Spark's `sample()` is neither).
  * [[stratified]] applies a per-stratum rate the same way, which is how a
  * mixture weighting ("10% of lang=en, 80% of lang=de, ...") stays exact
  * and auditable at 100 TB.
  */
object Sampling {

  /** Keep rows whose id-hash falls under `fraction` of the hash space. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of range: $fraction")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
    df.filter(bucket < (fraction * 1000000L).toLong)
  }

  /** Deterministic train/val/test split assignment: a `split` column with
    * one label per row, stable across runs/partitionings (id-hash bucket,
    * same mechanism as [[hashSample]]). Weights are normalized. */
  def split(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
            seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0))
    val total = weights.map(_._2).sum
    // all-zero weights would make every cut NaN -> every row silently
    // labeled with the LAST split; fail loudly instead
    require(total > 0, "split weights must not all be zero")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
    val cuts = weights.scanLeft(0.0)(_ + _._2 / total).tail.map(c => (c * 1000000L).toLong)
    val labeled = weights.map(_._1).zip(cuts).foldRight(lit(weights.last._1)) {
      case ((label, cut), acc) => when(bucket < cut, lit(label)).otherwise(acc)
    }
    // xxhash64 of a NULL id is seed-constant, so every id-less row would
    // land in ONE deterministic split together — fail loudly like
    // splitPortable's null-bucket guard
    df.withColumn("split",
      when(col(idCol).isNotNull, labeled).otherwise(raise_error(concat(
        lit(s"split: null '$idCol' cannot be assigned a split (all null " +
          "ids hash identically and pile into one label) — filter or " +
          "fill ids first")))))
  }

  /** Per-stratum deterministic sampling; strata absent from `fractions`
    * are dropped (mixture semantics). */
  def stratified(df: DataFrame, stratumCol: String, fractions: Map[String, Double],
                 idCol: String, seed: Long = 42L): DataFrame = {
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L))
    val rate = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(bucket < (rate * 1000000L).cast("long"))
  }

  /** Bucket space for [[portableBucket]]: Mersenne prime 2^31-1. */
  val PortableP: Long = 2147483647L

  /** Portable deterministic bucket in [0, P): Knuth multiplicative mixing
    * over pure int64 arithmetic, so ANY SQL engine reproduces it bit-exactly
    * (xxhash64 has no cross-engine twin). The id is reduced mod P first so
    * the product stays below 2^62 — no overflow even for 100 TB-scale ids.
    *
    * NON-NUMERIC ids (crawl UUIDs, URL keys): `cast("long")` yields NULL
    * under non-ANSI Spark, which used to silently drop EVERY row from the
    * mix/split/sample ops built on this bucket. Such ids now fold their
    * codepoints portably instead (h·B + cp mod P, the `shardOf` fold) —
    * numeric ids and numeric STRINGS keep the exact historical bucket. */
  def portableBucket(id: Column, seed: Long = 42L): Column = {
    val reduced = coalesce(pmod(id.cast("long"), lit(PortableP)),
      graft.functions.HashExpressions.portableStringFold(id.cast("string")))
    pmod(reduced * lit(2654435761L) + lit(seed), lit(PortableP))
  }

  /** Weighted sample WITHOUT replacement of k rows: the exponential-keys
    * method (Efraimidis & Spirakis 2006) — each row draws the deterministic
    * uniform u = (bucket+1)/P from its id hash and ranks by u^(1/w)
    * descending (equivalently ln(u)/w, monotone); the top k are the sample,
    * with inclusion probability ∝ weight. One TakeOrdered — no shuffle of
    * the collection, no driver state, reproducible across partitionings
    * (Spark's `sample()` is per-partition-RNG and neither weighted nor
    * stable). Non-positive weights are excluded outright — and so are NaN
    * weights (x/0.0 upstream): Spark orders NaN ABOVE every number, so an
    * unfiltered NaN key would crowd the whole top-k with garbage rows. */
  def weightedSample(df: DataFrame, weightCol: String, k: Int,
                     idCol: String, seed: Long = 42L): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (portableBucket(col(idCol), seed) + 1).cast("double") / lit(PortableP.toDouble)
    df.filter(col(weightCol) > 0 && !isnan(col(weightCol).cast("double")))
      .withColumn("__key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__key").desc, col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** [[stratified]] with the portable bucket — same mixture semantics, but
    * the sample membership is auditable from any engine that can do integer
    * arithmetic (the driver's DuckDB oracle checks it row-for-row). */
  def stratifiedPortable(df: DataFrame, stratumCol: String, fractions: Map[String, Double],
                         idCol: String, seed: Long = 42L): DataFrame = {
    val bucket = portableBucket(col(idCol), seed)
    val rate = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.filter(bucket < floor(rate * lit(PortableP.toDouble)).cast("long"))
  }

  /** [[split]] with the portable bucket: identical mixture semantics, but
    * the assignment is auditable from any SQL engine (the gate oracle
    * recomputes it row-for-row; xxhash64 has no cross-engine twin). */
  def splitPortable(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
                    seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0))
    val total = weights.map(_._2).sum
    require(total > 0, "split weights must not all be zero") // NaN cuts otherwise

    val bucket = portableBucket(col(idCol), seed)
    val cuts = weights.scanLeft(0.0)(_ + _._2 / total).tail
      .map(c => math.floor(c * PortableP.toDouble).toLong)
    val labeled = weights.map(_._1).zip(cuts).foldRight(lit(weights.last._1)) {
      case ((label, cut), acc) => when(bucket < cut, lit(label)).otherwise(acc)
    }
    // a NULL id gives a NULL bucket: every when() is null and the chain's
    // fallback would silently dump ALL id-less rows into the LAST split —
    // polluting exactly the eval/test label. Fail loudly at the row
    // instead (same stance as the NaN-cut guard above).
    df.withColumn("split",
      when(bucket.isNotNull, labeled).otherwise(raise_error(concat(
        lit(s"splitPortable: null '$idCol' cannot be assigned a split " +
          "(it would silently land in the last label) — filter or fill ids first")))))
  }

  /** LEAKAGE-SAFE split: every row is assigned by the portable split key
    * of its near-duplicate COMPONENT REPRESENTATIVE (the smallest id in
    * its cluster), so near-duplicates can never straddle a split
    * boundary — the eval-contamination path a per-row hash split leaves
    * open at scale (a template document lands in train, its near-copy in
    * test, and the eval score silently inflates). `pairs` is any
    * near-dup pair frame ((idACol, idBCol) — MinHash/LSH, SimHash,
    * embedding-cosine, fuzzy-join output all fit); rows without a pair
    * are their own representative, so the assignment degrades to
    * [[splitPortable]] exactly on a duplicate-free corpus.
    *
    * Scale shape: one [[graft.ops.Dedup.connectedComponents]] pass over
    * the PAIR graph (output-bound — pairs, not corpus), then one join of
    * the corpus against the (id, comp) labels on id. The corpus itself
    * never shuffles beyond that join. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
                       weights: Seq[(String, Double)],
                       seed: Long = 42L): DataFrame = {
    val comps = graft.ops.Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", idCol).withColumnRenamed("comp", "__rep_comp")
    val keyed = docs.join(comps, Seq(idCol), "left_outer")
      .withColumn("__rep", coalesce(col("__rep_comp"), col(idCol)))
      .drop("__rep_comp")
    splitPortable(keyed, "__rep", weights, seed).drop("__rep")
  }

  /** Downsample to a TARGET MIXTURE: given desired proportions per source
    * (e.g. web .6, books .3, code .1), emit the LARGEST dataset with
    * exactly those proportions that the data supports — the binding source
    * (smallest count/weight ratio) is kept whole and every other source is
    * hash-downsampled to match. This is the data-mixing step of a training
    * pipeline, derived in-plan:
    * counts are a tiny groupBy (|sources| rows, broadcast back), so no
    * driver round-trip, no collect; membership uses [[portableBucket]] so
    * the result is deterministic and engine-portable. Sources absent from
    * `weights` are dropped. */
  def mixToTarget(df: DataFrame, sourceCol: String, weights: Map[String, Double],
                  idCol: String, seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0))
    val wCol = weights.foldLeft(lit(null).cast("double")) { case (acc, (k, w)) =>
      when(col(sourceCol) === k, lit(w)).otherwise(acc)
    }
    // isin (not the CASE chain) so the source restriction pushes to the
    // parquet scan; explicit isNotNull so both consumers of the counts
    // aggregate canonicalize equal and AQE reuses its exchange
    val counts = df
      .filter(col(sourceCol).isNotNull && col(sourceCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(sourceCol)).agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", wCol)
    applyMixRates(df, counts, sourceCol, idCol, seed)
  }

  /** Shared binding-source machinery of [[mixToTarget]] and
    * [[temperatureMix]]: `counts` carries (__n, __w) per source; the
    * binding source (min n/w) sets the total, every source's keep-rate is
    * least(1, w·total/n), and membership is the portable bucket under the
    * per-source rate broadcast back — one tiny aggregate, no collect. */
  private def applyMixRates(df: DataFrame, counts: DataFrame, sourceCol: String,
                            idCol: String, seed: Long): DataFrame = {
    val totalN = counts.agg(min(col("__n") / col("__w")).as("__total"))
    val rates = counts.crossJoin(broadcast(totalN))
      .select(col(sourceCol),
        least(lit(1.0), col("__w") * col("__total") / col("__n")).as("__rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(portableBucket(col(idCol), seed) <
        floor(col("__rate") * lit(PortableP.toDouble)).cast("long"))
      .drop("__rate")
  }

  /** Temperature-flattened mixture (the multilingual / multi-source
    * sampling recipe: target share ∝ count^(1/T), Devlin et al.'s mBERT
    * exponent smoothing): derive the per-source weights FROM the observed
    * counts — head sources downsampled, the rarest source kept whole —
    * then apply the same binding-source/portable-bucket machinery as
    * [[mixToTarget]]. T=1 reproduces the natural distribution (no-op);
    * T→∞ approaches uniform shares. Everything stays in-plan (tiny
    * source-count aggregate broadcast back, no collect).
    *
    * T=2 uses `sqrt` (IEEE correctly-rounded, so any engine reproduces
    * membership bit-exactly — the oracle-gate configuration); other T go
    * through `pow`, whose last-ulp is libm-dependent: fine in production,
    * not for cross-engine hash comparison. */
  def temperatureMix(df: DataFrame, sourceCol: String, temperature: Double,
                     idCol: String, seed: Long = 42L): DataFrame = {
    require(temperature >= 1.0, "temperature >= 1 (T<1 sharpens, not supported)")
    def powInvT(c: Column): Column =
      if (temperature == 2.0) sqrt(c) else pow(c, lit(1.0 / temperature))
    val counts = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol)).agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", powInvT(col("__n")))
    applyMixRates(df, counts, sourceCol, idCol, seed)
  }

  /** Downsample to a per-source TOKEN budget — mixture planning the way
    * training runs are actually provisioned ("2T tokens total: 50% web,
    * 30% books, 20% code"), where doc-count shares misallocate because
    * document lengths differ by source.
    *
    * Selection is a deterministic hash-ordered prefix of each source at
    * BUCKET granularity: docs land in `nBuckets` portable-hash buckets,
    * per-(source, bucket) token sums roll up to a tiny aggregate
    * (|sources|·nBuckets rows), a cumulative sum over ordered buckets
    * finds each source's cutoff bucket, and the cutoffs broadcast back as
    * a filter — so the corpus is scanned once, shuffled never, and the
    * only window runs over the small aggregate. Kept tokens overshoot the
    * per-source budget by at most one bucket (~1/nBuckets of the source);
    * raise `nBuckets` for tighter tracking. Membership is reproducible
    * across partitionings and engines ([[portableBucket]] math only).
    *
    * A source with fewer tokens than its budget is kept whole; every
    * source keeps at least its first bucket (a budget too small to matter
    * still yields a sample, not an empty split). */
  def mixToTokenBudget(df: DataFrame, sourceCol: String, shares: Map[String, Double],
                       totalTokens: Long, tokensCol: String, idCol: String,
                       nBuckets: Int = 1024, seed: Long = 42L): DataFrame = {
    require(shares.nonEmpty && shares.values.forall(_ > 0), "shares must be positive")
    require(totalTokens > 0 && nBuckets > 0)
    val sumW = shares.values.sum
    val budget = shares.foldLeft(lit(null).cast("long")) { case (acc, (k, w)) =>
      // clamped to >= 1 token so a share whose floor rounds to 0 still
      // keeps its first bucket (the documented every-source-sampled
      // contract) instead of producing an empty split
      when(col(sourceCol) === k,
        lit(math.max(1L, math.floor(w / sumW * totalTokens).toLong))).otherwise(acc)
    }
    val bucket = pmod(portableBucket(col(idCol), seed), lit(nBuckets.toLong))
    val in = df.filter(col(sourceCol).isNotNull && col(sourceCol).isin(shares.keys.toSeq: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(col("__b"))
    val cuts = in
      .groupBy(col(sourceCol), bucket.as("__b"))
      .agg(sum(col(tokensCol).cast("long")).as("__t"))
      .withColumn("__cum", sum(col("__t")).over(w))
      // a bucket is kept iff the budget is not exhausted BEFORE it starts
      .filter(col("__cum") - col("__t") < budget)
      .groupBy(col(sourceCol)).agg(max(col("__b")).as("__cut"))
    in.join(broadcast(cuts), Seq(sourceCol))
      .filter(bucket <= col("__cut"))
      .drop("__cut")
  }

  /** EXACTLY `k` rows per group (fewer if the group is smaller),
    * deterministically: rank rows within each group by their portable id
    * hash (ties broken by id) and keep rank <= k. This is the eval-set
    * carving primitive — "give me 1000 uniform docs per language" — where
    * a fractional rate can't hit an exact count and `Dataset.sample` isn't
    * reproducible across partitionings.
    *
    * Scale shape: one shuffle on the group key and a per-group sort —
    * fine for the many-small-groups case this targets. A group so hot it
    * dominates a partition would need a two-pass rank-threshold refinement
    * (compute the k-th hash per group first, then filter); not needed
    * until a single group approaches executor memory. */
  def sampleKPerGroup(df: DataFrame, groupCol: String, k: Int,
                      idCol: String, seed: Long = 42L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(portableBucket(col(idCol), seed), col(idCol))
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= k).drop("__rk")
  }
}
