package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{HashExpressions, TextFunctions}

/** Eval-set decontamination: flag evaluation documents whose word-n-gram
  * shingles are heavily contained in the training corpus — the standard
  * benchmark-leakage check run before training on web-scale data.
  *
  * Shape: explode both sides to (doc, shingle) rows, LEFT SEMI join the
  * eval shingles against the DISTINCT train shingle set, and compare the
  * surviving count to the doc's shingle count. Everything is equi-join +
  * aggregation — at 100 TB the train shingle set shuffles once (or lives
  * as a bucketed table) and each eval doc costs |shingles| probe rows.
  */
object Decontaminate {

  /** @return one row per eval doc — INCLUDING docs too short to shingle
    *         (empty/null text, fewer than `shingleSize` tokens), which
    *         report `n_shingles = 0, containment = 0.0, contaminated =
    *         false` rather than silently vanishing: a consumer treating
    *         absence as "audited clean" must never skip the short
    *         benchmark items. Columns: total shingles, how many appear
    *         anywhere in train, the containment fraction, and the flag. */
  def containment(train: DataFrame, eval: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val trainShingles = train
      .select(explode(TextFunctions.wordShingles(col(textCol), shingleSize)).as("sh"))
      .distinct()
    // explode_OUTER: a zero-shingle eval doc keeps one null-shingle row
    // (excluded from both counts) instead of dropping out of the report
    val evalShingles = eval
      .select(col(idCol), explode_outer(TextFunctions.wordShingles(col(textCol), shingleSize)).as("sh"))
    // One pass over the eval side: a left-outer probe against the DISTINCT
    // train set cannot fan out, so total and shared counts come from the
    // same aggregate (two scans + two aggs otherwise).
    evalShingles
      .join(trainShingles.withColumn("__hit", lit(1)), Seq("sh"), "left_outer")
      .groupBy(idCol)
      .agg(count(col("sh")).as("n_shingles"), count(col("__hit")).as("n_shared"))
      .select(
        col(idCol),
        col("n_shingles"),
        col("n_shared"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(col("n_shared").cast("double") / col("n_shingles"), 6))
          .as("containment"))
      .withColumn("contaminated", col("containment") >= threshold)
  }

  /** Bloom-filter fast path for [[containment]] — the configuration that
    * wins when `train` is the 100 TB side: the train shingle set is folded
    * into a fixed-size bit array with ONE tree-aggregated pass (never
    * shuffled against the eval side), broadcast to executors (a few
    * hundred MB for billions of shingles at `fpp` 1e-3), and each eval
    * shingle probes it map-side. No join at all on the hot path.
    *
    * One-sided error: a Bloom filter has no false negatives, so reported
    * containment can only be >= the exact value, by at most ~`fpp` — the
    * safe direction for a leakage check (never under-reports). Run
    * [[containment]] on the flagged survivors when exact numbers matter.
    *
    * @param expectedShingles sizing hint for the filter (distinct train
    *                         shingles); overestimating wastes bits,
    *                         underestimating inflates the realized FP rate.
    */
  def bloomContainment(train: DataFrame, eval: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       shingleSize: Int = 3, threshold: Double = 0.5,
                       expectedShingles: Long = 1000000L, fpp: Double = 0.001): DataFrame = {
    // hash shingles to FULL-64-bit longs: the filter stores 8-byte keys,
    // not text, and the SAME kernel hashes both sides so membership is
    // consistent. 64 bits, NOT the MinHash family's mod-P reduction —
    // at the billions-of-train-shingles scale this face advertises, a
    // 31-bit space saturates (occupancy 1−exp(−D/2³¹) → every clean eval
    // doc reports high containment from chance collisions alone); full
    // 64-bit keys keep the Bloom fpp the actual error floor, preserving
    // the documented "over-reports by at most ~fpp" bound.
    def shingleHashes(df: DataFrame, cols: org.apache.spark.sql.Column*) =
      df.select(cols :+ explode_outer(
        HashExpressions.wordShingleHashes64(col(textCol), shingleSize)).as("sh"): _*)
    val filter = shingleHashes(train).filter(col("sh").isNotNull)
      .stat.bloomFilter("sh", expectedShingles, fpp)
    val bc = train.sparkSession.sparkContext.broadcast(filter)
    // codegen'd probe over the broadcast handle — stays inside whole-stage
    // codegen where a udf() would force an interpreted boxing boundary
    val hit = HashExpressions.bloomMightContain(col("sh"), bc)
    // explode_outer + count(sh): zero-shingle eval docs stay in the report
    // (same one-row-per-eval-doc contract as the exact face)
    shingleHashes(eval, col(idCol))
      .groupBy(idCol)
      .agg(count(col("sh")).as("n_shingles"),
        count(when(hit, 1)).as("n_shared"))
      .select(
        col(idCol),
        col("n_shingles"),
        col("n_shared"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(col("n_shared").cast("double") / col("n_shingles"), 6))
          .as("containment"))
      .withColumn("contaminated", col("containment") >= threshold)
  }

  /** Collect + sort a SMALL eval embedding set for the fused argmax kernel
    * — ids widened to long (so both decontamination faces emit the same
    * `nearest_eval_id` schema for any integral id column), vectors to
    * double (value-exact from float), sorted ascending so the kernel's
    * first-wins tie-break means lowest id. Bounded by contract: benchmarks
    * are thousands of rows — the same collect the streaming face has
    * always done, now shared. */
  /** Driver-materialization ceiling for [[collectEvalSet]]: at 768-dim
    * doubles this is ~3 GB of eval vectors — far past "benchmarks are
    * thousands of rows", and the signal the caller grabbed the TRAIN
    * side by mistake. The guard fails with the fix (swap arguments, or
    * use the LSH face) instead of a driver OOM mid-collect. */
  private[graft] val MaxEvalRows = 500000

  private[graft] def collectEvalSet(eval: DataFrame, idCol: String, vecCol: String)
      : (Array[Long], Array[Array[Double]]) = {
    val rows = eval
      // a null id or vector can never win an argmax — the retired
      // crossJoin plan ignored such rows via null cosines; dropping them
      // here keeps that tolerance (instead of an NPE at plan time)
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .limit(MaxEvalRows + 1)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty, "semantic decontamination needs a non-empty eval set")
    require(rows.length <= MaxEvalRows,
      s"semantic decontamination eval set exceeds $MaxEvalRows rows — the eval " +
        "side must be the SMALL benchmark set (did the arguments get swapped?); " +
        "for genuinely large eval sets use semanticContainmentLsh")
    (rows.map(_._1), rows.map(_._2))
  }

  /** SEMANTIC decontamination: flag TRAIN documents whose embedding is
    * within cosine `threshold` of ANY eval-set embedding — the leakage
    * check lexical shingles miss (paraphrases, translations, format
    * shifts of a benchmark item). Direction is the actionable one: the
    * flagged side is the training corpus (drop the rows), where
    * [[containment]] scores the eval side.
    *
    * Shape: the eval set is SMALL by nature (benchmarks are thousands of
    * rows, train is the 100 TB side), so it rides each task as a codegen
    * reference object and every train row computes its own fused argmax
    * ([[graft.functions.NearestEvalExpr]]) — a PURE MAP: no join, no row
    * inflation, no shuffle at all (the previous crossJoin(broadcast) →
    * max(struct) plan paid n×|eval| rows plus an O(train) groupBy). Ties
    * on the rounded cosine break to the LOWEST eval id, so a SQL oracle
    * replays the argmax exactly. One row out per train ROW (ids are
    * expected unique — this is a flag pass, not an aggregate).
    *
    * @return one row per train doc: `max_cosine`, `nearest_eval_id`
    *         (bigint for any integral eval id), and the flag. */
  def semanticContainment(train: DataFrame, eval: DataFrame,
                          threshold: Double = 0.8,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val (ids, vecs) = collectEvalSet(eval, idCol, vecCol)
    train
      .withColumn("__best",
        graft.functions.VectorExpressions.nearestEval(col(vecCol), ids, vecs))
      .select(col(idCol),
        col("__best.max_cosine").as("max_cosine"),
        col("__best.nearest_eval_id").as("nearest_eval_id"),
        (col("__best.max_cosine") >= threshold).as("contaminated"))
  }

  /** The scale face of [[semanticContainment]]: hyperplane-bucket BOTH
    * sides on shared planes and verify cosine only for bucket collisions
    * — per-train-row work drops from |eval| dot products to the handful
    * of eval rows sharing its bucket. LSH recall trade: a contaminated
    * pair split across buckets is missed (collision probability
    * `(1 − θ/π)^bits` per plane set). Recall recovery is a PARAMETER:
    * every extra entry in `seeds` re-buckets both sides on independently
    * rotated planes and the collision sets union BEFORE the one per-train
    * argmax, so a pair any plane set keeps together is found — miss
    * probability multiplies per seed, cost is one broadcast bucket-join
    * per seed. When `seeds` is empty (the default) the count derives from
    * (threshold, bits) via [[Similarity.recallSeeds]]: targets ≥80%
    * recall for duplicate-grade leakage (cosine ≥ max(threshold, 0.9)),
    * which is the grade decontamination exists to catch — met at this
    * face's default narrow codes (bits ≤ 8); at wider codes the policy's
    * 5-seed cap binds and only near-exact leakage stays fully covered
    * (read the achieved number with [[Similarity.lshRecall]]; verbatim
    * benchmark pastes score cosine ≈ 1 and are kept at any width). Output
    * contains ONLY train
    * docs with at least one colliding eval candidate — absent rows are
    * clean at this recall, which is the useful direction (the flag list
    * is what gets dropped). */
  def semanticContainmentLsh(train: DataFrame, eval: DataFrame,
                             threshold: Double = 0.8, bits: Int = 8,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding",
                             seeds: Seq[Long] = Nil): DataFrame = {
    val seedsResolved =
      if (seeds.nonEmpty) seeds else Similarity.recallSeeds(threshold, bits)
    val dim = Similarity.resolveDim(train, vecCol, -1)
    def collisions(seed: Long): DataFrame = {
      val planes = Similarity.hyperplanes(bits, dim, seed)
      val tb = train.select(col(idCol), col(vecCol).as("__tv"))
        .withColumn("__bkt", Similarity.bucketExpr("__tv", planes))
      // eid widened to long like the exact + streaming faces, so every
      // semantic-decontamination face emits the same nearest_eval_id
      // schema — and filtered like collectEvalSet (null ids/vectors can
      // never meaningfully win an argmax; unfiltered, a null-id eval row
      // could win and report nearest_eval_id = null, so the two faces
      // would disagree on identical input)
      val eb = broadcast(eval
        .where(col(idCol).isNotNull && col(vecCol).isNotNull)
        .select(col(idCol).cast("long").as("__eid"), col(vecCol).as("__ev"))
        .withColumn("__bkt", Similarity.bucketExpr("__ev", planes)))
      tb.join(eb, "__bkt")
        .withColumn("__c",
          round(graft.functions.VectorFunctions.cosineSimilarity(col("__tv"), col("__ev")), 6))
        .select(col(idCol), col("__eid"), col("__c"))
    }
    // union collisions across plane sets, ONE argmax: a (train, eval) pair
    // colliding under several seeds scores identically, so no pre-dedup is
    // needed before the max
    seedsResolved.map(collisions).reduce(_ unionByName _)
      .groupBy(idCol)
      .agg(max(struct(col("__c").as("c"), (-col("__eid")).as("negid"))).as("best"))
      .select(col(idCol),
        col("best.c").as("max_cosine"),
        (-col("best.negid")).as("nearest_eval_id"),
        (col("best.c") >= threshold).as("contaminated"))
  }
}
