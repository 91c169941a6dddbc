package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.model.Canonical

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  private def canon = Canonical.from(
    Tables(spark, sf(), "embeddings").limit(20),
    idCol = "vec_id", vectorCol = Some("embedding"), metadataCols = Seq("label"))

  test("addSourceTracking stamps provenance (examples/add_source_tracking.py parity)") {
    val out = Transforms.addSourceTracking("pgvector", "2026-08-12T00:00:00")(canon)
    val m = out.select(Canonical.METADATA).head().getAs[Map[String, String]](0)
    assert(m("source_db") == "pgvector")
    assert(m("migration_timestamp") == "2026-08-12T00:00:00")
    assert(m.contains("label")) // original keys preserved
  }

  test("addSourceTracking is idempotent: a re-run restamps, never DUPLICATE_MAP_KEY") {
    val once = Transforms.addSourceTracking("pgvector", "2026-08-12T00:00:00")(canon)
    val twice = Transforms.addSourceTracking("qdrant", "2026-08-15T00:00:00")(once)
    val m = twice.select(Canonical.METADATA).head().getAs[Map[String, String]](0)
    assert(m("source_db") == "qdrant") // latest stamp wins
    assert(m("migration_timestamp") == "2026-08-15T00:00:00")
    assert(m.contains("label"))
  }

  test("renameMetadataKey onto an OCCUPIED key overwrites, never DUPLICATE_MAP_KEY") {
    val withBoth = Transforms.addSourceTracking("pg", "t0")(canon) // adds source_db
    val out = Transforms.renameMetadataKey("label", "source_db")(withBoth)
    val m = out.select(Canonical.METADATA).head().getAs[Map[String, String]](0)
    assert(!m.contains("label") && m.contains("source_db"))
    assert(m("source_db") != "pg", "rename must overwrite the occupied key")
  }

  test("chunkAndEmbed: whitespace-only text passes through; chunk re-runs are safe") {
    val spark2 = spark
    import spark2.implicits._
    val mixed = Seq(
      ("1", Seq(1.0f), Map("text" -> "alpha beta gamma delta")),
      ("2", Seq(2.0f), Map("text" -> "   ")), // used to VANISH entirely
      ("3", Seq(3.0f), Map("k" -> "v")))
      .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
    val out = Transforms.chunkAndEmbed(width = 2, stride = 2)(mixed)
    val ids = out.select(Canonical.ID).as[String].collect().toSet
    assert(ids.contains("2"), "whitespace-only-text record dropped")
    assert(ids.contains("3") && ids.contains("1#0") && ids.contains("1#1"))
    // feeding the output back in (the documented-safe re-run): chunk rows
    // carry parent_id/chunk_idx already — must not DUPLICATE_MAP_KEY
    val again = Transforms.chunkAndEmbed(width = 2, stride = 2)(out)
    val m = again.filter(col(Canonical.ID) === "1#0#0")
      .select(Canonical.METADATA).head().getAs[Map[String, String]](0)
    assert(m("parent_id") == "1#0" && m("chunk_idx") == "0")
  }

  test("filterByMetadata drops records") {
    val out = Transforms.filterByMetadata("metadata['label'] >= '5'")(canon)
    assert(out.count() > 0 && out.count() < 20)
  }

  test("renameMetadataKey moves the value, no-op when missing") {
    val out = Transforms.renameMetadataKey("label", "class")(canon)
    val m = out.select(Canonical.METADATA).head().getAs[Map[String, String]](0)
    assert(m.contains("class") && !m.contains("label"))
    val noop = Transforms.renameMetadataKey("missing", "x")(canon)
    assert(noop.select(Canonical.METADATA).head().getAs[Map[String, String]](0).contains("label"))
  }

  test("normalizeVectors yields unit vectors") {
    val out = Transforms.normalizeVectors(canon)
    val n = out.select(graft.functions.VectorFunctions.l2Norm(col(Canonical.VECTOR)))
      .as[Double].head()
    assert(math.abs(n - 1.0) < 1e-5)
  }

  test("rowMap escape hatch: arbitrary per-record logic, including drops") {
    val out = Transforms.rowMap { r =>
      if (r.id.toLong % 2 == 0) Some(r.copy(metadata = r.metadata + ("even" -> "true")))
      else None
    }(canon)
    assert(out.count() == 10)
    assert(out.select(Canonical.METADATA).head().getAs[Map[String, String]](0)("even") == "true")
  }

  test("keepBestDedup keeps the highest-scoring copy of identical text") {
    val df = Seq(
      ("a1", Seq(1f, 0f), Map("text" -> "same words here", "q" -> "0.2")),
      ("a2", Seq(0f, 1f), Map("text" -> "same  words   here", "q" -> "0.9")),
      ("b1", Seq(1f, 1f), Map("text" -> "different", "q" -> "0.1")),
      ("n1", Seq(0f, 0f), Map.empty[String, String])) // no text: passes through
      .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
    val out = Transforms.keepBestDedup(scoreKey = "q")(df)
      .select(Canonical.ID).as[String].collect().toSet
    assert(out == Set("a2", "b1", "n1")) // a2 wins on score despite higher id
    // registry face resolves and agrees
    val viaRegistry = graft.core.TransformPipeline.resolve(
      graft.config.TransformStep("keep_best_dedup", Map("score_key" -> "q")))(df)
      .select(Canonical.ID).as[String].collect().toSet
    assert(viaRegistry == out)
  }

  test("mixTokenBudget keeps per-source token budgets over canonical records") {
    val docs = (0 until 40).map { i =>
      val src = if (i % 2 == 0) "web" else "books"
      (s"doc$i", Seq(1f, 0f), Map("source" -> src, "text" -> ("w " * 10).trim))
    }.toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
    val out = graft.core.TransformPipeline.resolve(graft.config.TransformStep(
      "mix_token_budget", Map("shares" -> "web=0.5,books=0.5",
        "total_tokens" -> "100", "n_buckets" -> "8")))(docs)
    val bySrc = out.withColumn("s", element_at(col(Canonical.METADATA), "source"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 200 tokens available per source, 50-token budget each: a strict
    // subset survives on both sides, nonempty, bucket-granular
    assert(bySrc.keySet == Set("web", "books"))
    assert(bySrc.values.forall(n => n >= 1 && n < 20), bySrc.toString)
    // deterministic under repartitioning
    val again = graft.core.TransformPipeline.resolve(graft.config.TransformStep(
      "mix_token_budget", Map("shares" -> "web=0.5,books=0.5",
        "total_tokens" -> "100", "n_buckets" -> "8")))(docs.repartition(5))
      .select(Canonical.ID).as[String].collect().toSet
    assert(again == out.select(Canonical.ID).as[String].collect().toSet)
  }

  test("transforms compose with andThen") {
    val pipeline = Transforms.addSourceTracking("qdrant", "t0")
      .andThen(Transforms.filterByMetadata("metadata['label'] = '3'"))
    val out = pipeline(canon)
    assert(out.count() > 0)
    assert(out.select(Canonical.METADATA).collect()
      .forall(_.getAs[Map[String, String]](0)("label") == "3"))
  }
}

/** The decontamination family as DECLARATIVE pipeline verbs — reachable
  * from a reviewed JSON config, not just the Scala API. */
class DecontaminateStepSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.core.TransformPipeline
  import graft.config.TransformStep

  // canonical records: 1 = verbatim benchmark item, 2 = novel text,
  // 3 = no text key at all (must pass through)
  private def records = Seq(
    ("1", Seq(1.0f, 0.0f), Map("text" -> "the quick brown fox jumps over the lazy dog")),
    ("2", Seq(0.0f, 1.0f), Map("text" -> "completely unrelated training prose about spark plans")),
    ("3", Seq(0.5f, 0.5f), Map("lang" -> "en")))
    .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("eval").toString

  test("decontaminate pipeline step drops n-gram collisions (bloom + exact)") {
    val evalPath = tmp("lexdecon")
    Seq("the quick brown fox jumps over the lazy dog and more")
      .toDF("text").write.parquet(evalPath)
    Seq(true, false).foreach { bloom =>
      val step = TransformPipeline.resolve(TransformStep("decontaminate",
        Map("eval_path" -> evalPath, "ngram" -> "8", "bloom" -> bloom.toString)))
      val ids = step(records).select(Canonical.ID).as[String].collect().sorted.toSeq
      assert(ids == Seq("2", "3"), s"bloom=$bloom -> $ids")
    }
  }

  test("decontaminate catches a benchmark item DILUTED inside a long document") {
    // the primary leakage pattern: a verbatim benchmark question pasted
    // into a much longer page. Whole-document containment dilutes to ~2%
    // and passes any sane threshold; the n-gram COLLISION rule drops it.
    val evalPath = tmp("lexdecon_dilute")
    Seq("the quick brown fox jumps over the lazy dog every single day")
      .toDF("text").write.parquet(evalPath)
    val filler = (1 to 300).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      ("L1", Seq(1.0f, 0.0f), Map("text" ->
        (filler + " the quick brown fox jumps over the lazy dog every single day " + filler))),
      ("L2", Seq(0.0f, 1.0f), Map("text" -> (filler + " nothing borrowed here " + filler))))
      .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA)
    Seq(true, false).foreach { bloom =>
      val step = TransformPipeline.resolve(TransformStep("decontaminate",
        Map("eval_path" -> evalPath, "bloom" -> bloom.toString)))
      val ids = step(docs).select(Canonical.ID).as[String].collect().toSeq
      assert(ids == Seq("L2"), s"bloom=$bloom: diluted benchmark item leaked -> $ids")
    }
  }

  test("decontaminate: malformed numeric params are config errors, not NumberFormat") {
    intercept[graft.config.ConfigException] {
      TransformPipeline.resolve(TransformStep("decontaminate",
        Map("eval_path" -> "/x", "expected_shingles" -> "1e6")))
    }
  }

  test("decontaminate: a pre-round-12 config aborts loudly, never silently re-interprets") {
    // the semantics changed (containment fraction -> n-gram collision);
    // an old config's knobs must be a hard error, not ignored keys
    Seq("threshold" -> "0.9", "shingle_size" -> "3").foreach { case (k, v) =>
      val e = intercept[graft.config.ConfigException] {
        TransformPipeline.resolve(TransformStep("decontaminate",
          Map("eval_path" -> "/x", k -> v)))
      }
      assert(e.getMessage.contains("no longer takes"), e.getMessage)
    }
  }

  test("semantic_decontaminate step drops near-benchmark vectors; NaN fails closed") {
    val evalPath = tmp("semdecon")
    Seq((10L, Seq(1.0f, 0.05f))).toDF("vec_id", "embedding").write.parquet(evalPath)
    val withNaN = records.unionByName(Seq(
      ("4", Seq(Float.NaN, 1.0f), Map("text" -> "corrupt vector")))
      .toDF(Canonical.ID, Canonical.VECTOR, Canonical.METADATA))
    val step = TransformPipeline.resolve(TransformStep("semantic_decontaminate",
      Map("eval_path" -> evalPath, "threshold" -> "0.9")))
    val ids = step(withNaN).select(Canonical.ID).as[String].collect().sorted.toSeq
    // 1 is cosine~0.999 to the benchmark vector -> dropped; 4 is NaN ->
    // dropped (fail closed); 2 orthogonal and 3 mid both survive
    assert(ids == Seq("2", "3"), ids.toString)
  }

  test("missing eval_path aborts with a config error, not a silent no-op") {
    intercept[graft.config.ConfigException] {
      TransformPipeline.resolve(TransformStep("decontaminate", Map.empty))
    }
    intercept[graft.config.ConfigException] {
      TransformPipeline.resolve(TransformStep("semantic_decontaminate", Map.empty))
    }
  }
}

/** ANN quality: the approximate paths must actually approximate the exact
  * answer, not just run. */
class AnnRecallSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf(), "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 10)

  private def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-probe LSH top-k reaches recall > 0.4") {
    val exact = topkSet(Similarity.bruteForceTopK(emb, queries, k = 5))
    val lsh = topkSet(Similarity.lshTopK(emb, queries, k = 5, bits = 4))
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall > 0.4, s"LSH recall $recall too low")
  }

  test("IVF top-k with nProbe=4 of 16 cells reaches recall > 0.5") {
    val exact = topkSet(Similarity.bruteForceTopK(emb, queries, k = 5))
    val ivf = topkSet(Similarity.ivfTopK(emb, queries, k = 5, nCells = 16, nProbe = 4))
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall > 0.5, s"IVF recall $recall too low")
  }

  test("IVF with a Lloyd's-trained quantizer: exhaustive probe still exact, selective stays useful") {
    val exact = topkSet(Similarity.bruteForceTopK(emb, queries, k = 5))
    // exhaustive probe must equal brute force under ANY quantizer
    val all = topkSet(Similarity.ivfTopK(emb, queries, k = 5, nCells = 8, nProbe = 8,
      quantizerIters = 3))
    assert(all == exact, "exhaustive-probe IVF diverged from brute force")
    val trained = topkSet(Similarity.ivfTopK(emb, queries, k = 5, nCells = 16, nProbe = 4,
      quantizerIters = 3))
    val recall = (exact intersect trained).size.toDouble / exact.size
    assert(recall > 0.5, s"trained-quantizer recall $recall too low")
  }

  test("semantic (k-means-blocked) dedup: exact precision, useful recall") {
    val all = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
      .crossJoin(emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", graft.functions.VectorFunctions.cosineSimilarity(col("v_a"), col("v_b")))
      .filter(col("cos") >= 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = Dedup.semanticNearDupPairs(emb, threshold = 0.3, nClusters = 8, iters = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sem.subsetOf(all), "semantic pairs must verify exactly (precision 1)")
    val recall = if (all.isEmpty) 1.0 else (all intersect sem).size.toDouble / all.size
    assert(recall > 0.2, s"semantic recall $recall; all=${all.size} sem=${sem.size}")
  }

  test("semantic dedup auto cluster count = max(16, ceil(sqrt(n))) matches explicit k") {
    val n = emb.count()
    val expK = math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt)
    val auto = Dedup.semanticNearDupPairs(emb, threshold = 0.3, nClusters = -1, iters = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val fixed = Dedup.semanticNearDupPairs(emb, threshold = 0.3, nClusters = expK, iters = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(auto == fixed && auto.nonEmpty, s"auto=${auto.size} fixed=${fixed.size} k=$expK")
  }

  test("lshCosinePairs finds the same high-similarity pairs as the exact blocked scan") {
    val exact = Dedup.cosineNearDupPairs(emb, blockCol = "label", threshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bits=2: collision prob for a cosine-0.4 pair is (1-θ/π)² ≈ 0.4 —
    // the single-table pair generator has no multi-probe, so recall is
    // bounded by that; 2 bits keeps it useful while still pruning 4×
    val lsh = Similarity.lshCosinePairs(emb, threshold = 0.4, bits = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = (exact intersect lsh).size.toDouble / exact.size
      assert(recall > 0.2, s"pair recall $recall; exact=${exact.size} lsh=${lsh.size}")
    } else assert(lsh != null)
  }

  test("multi-seed LSH: 3 rotated plane sets recover recall a single set loses") {
    val exact = Dedup.cosineNearDupPairs(emb, blockCol = "label", threshold = 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assume(exact.nonEmpty)
    def recallAt(seeds: Seq[Long]): (Double, Set[(Long, Long)]) = {
      val got = Similarity.lshCosinePairs(emb, threshold = 0.4, bits = 4, seeds = seeds)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ((exact intersect got).size.toDouble / exact.size, got)
    }
    val (r1, p1) = recallAt(Seq(7L))
    val (r3, p3) = recallAt(Seq(7L, 8L, 9L))
    // the 3-seed union is a superset of the seed-7 pass by construction
    assert(p1.subsetOf(p3), s"union lost pairs: ${p1 -- p3}")
    assert(r3 >= r1, s"recall fell with more seeds: $r1 -> $r3")
    // at bits=4 a cosine-0.4 pair collides with p≈0.16 per set; 3 sets
    // lift that to ≈0.4 — require a real, not incidental, improvement
    assert(r3 > r1 + 0.05 || r1 > 0.95,
      s"3 seeds did not move recall: $r1 -> $r3 (exact=${exact.size})")
    // same API on the decontamination face: flags monotonically grow
    val train = emb.filter(col("vec_id") % 20 =!= 0)
    val evalSet = emb.filter(col("vec_id") % 20 === 0)
    def flagged(seeds: Seq[Long]): Set[Long] =
      Decontaminate.semanticContainmentLsh(train, evalSet, threshold = 0.4,
          bits = 4, seeds = seeds)
        .filter(col("contaminated")).select("vec_id")
        .collect().map(_.getLong(0)).toSet
    val f1 = flagged(Seq(7L))
    val f3 = flagged(Seq(7L, 8L, 9L))
    assert(f1.subsetOf(f3), s"multi-seed lost flags: ${f1 -- f3}")
  }

  test("semantic decontamination: LSH face is precision-1 vs exact, useful recall") {
    val train = emb.filter(col("vec_id") % 20 =!= 0)
    val evalSet = emb.filter(col("vec_id") % 20 === 0)
    val exact = Decontaminate.semanticContainment(train, evalSet, threshold = 0.4)
      .filter(col("contaminated"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // bits=2: collision prob for a cosine-0.4 pair ≈ 0.4 per plane pair —
    // same rationale as the lshCosinePairs recall test
    val lsh = Decontaminate.semanticContainmentLsh(train, evalSet, threshold = 0.4, bits = 2)
      .filter(col("contaminated"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // flagged-by-LSH ⊆ flagged-by-exact, and the max_cosine it reports
    // never exceeds the true max (it saw a subset of candidates)
    assert(lsh.keySet.subsetOf(exact.keySet),
      s"LSH flagged ${lsh.keySet -- exact.keySet} that exact did not")
    lsh.foreach { case (id, c) => assert(c <= exact(id) + 1e-9, s"$id: $c > ${exact(id)}") }
    if (exact.nonEmpty) {
      val recall = (exact.keySet intersect lsh.keySet).size.toDouble / exact.size
      assert(recall > 0.2, s"decontamination recall $recall; exact=${exact.size}")
    }
  }

  test("cosineNearDupPairs maxBlock guard trips on an oversized block (error mode)") {
    // every label block exceeds maxBlock=10 at sf0.01 (≥ 44 rows/label)
    val ex = intercept[Exception] {
      Dedup.cosineNearDupPairs(emb, blockCol = "label", threshold = 0.4,
        maxBlock = 10).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxBlock")), ex.toString)
  }

  test("cosineNearDupPairs oversized=lsh routes big blocks, keeps small blocks exact") {
    val exact = Dedup.cosineNearDupPairs(emb, blockCol = "label", threshold = 0.4)
      .select("blk", "id_a", "id_b", "cosine")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // cap above every block: identical plan and output, no LSH leg
    val unrouted = Dedup.cosineNearDupPairs(emb, blockCol = "label", threshold = 0.4,
        maxBlock = 1000, oversized = "lsh")
      .select("blk", "id_a", "id_b", "cosine")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(unrouted == exact && exact.nonEmpty)
    // cap below every block: all blocks route through (label × bucket) —
    // a strict-precision subset of the exact pairs (LSH recall trade)
    val routed = Dedup.cosineNearDupPairs(emb, blockCol = "label", threshold = 0.4,
        maxBlock = 10, oversized = "lsh")
      .select("blk", "id_a", "id_b", "cosine")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(routed.subsetOf(exact), s"routed ${routed.size} not ⊆ exact ${exact.size}")
    if (exact.nonEmpty) {
      val recall = (exact intersect routed).size.toDouble / exact.size
      assert(recall > 0.1, s"routed recall $recall")
    }
  }

  test("lshCosinePairsAuto sizes the bit width from the corpus and matches the fixed path") {
    // n/targetBucket rounds UP to the next power of two: bucket occupancy
    // is bounded by the target at any corpus size (the linear-scale knob)
    val n = emb.count()
    val expBits = math.max(4, math.min(24,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n / 64) - 1)))
    // the default derives its seed set from (threshold, bits) — the fixed
    // path must be handed the SAME policy output to match
    val expSeeds = Similarity.recallSeeds(0.4, expBits)
    val auto = Similarity.lshCosinePairsAuto(emb, threshold = 0.4, targetBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fixed = Similarity.lshCosinePairs(emb, threshold = 0.4, bits = expBits,
        seeds = expSeeds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(auto == fixed, s"auto=${auto.size} fixed=${fixed.size} bits=$expBits")
    // and an explicit seed argument still pins exactly that configuration
    val pinned = Similarity.lshCosinePairsAuto(emb, threshold = 0.4,
        targetBucket = 64, seeds = Seq(7L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pinnedFixed = Similarity.lshCosinePairs(emb, threshold = 0.4, bits = expBits)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pinned == pinnedFixed)
  }

  test("recallSeeds policy: derived counts follow the collision math") {
    // p = (1-θ/π)^bits at simRef = max(threshold, 0.9); s = ⌈ln(1-R)/ln(1-p)⌉
    def expected(threshold: Double, bits: Int, r: Double, cap: Int): Int = {
      val p = math.pow(1.0 - math.acos(math.min(0.999, math.max(threshold, 0.9))) / math.Pi, bits)
      math.max(1, math.min(cap, math.ceil(math.log(1.0 - r) / math.log(1.0 - p)).toInt))
    }
    for (bits <- Seq(4, 8, 12); t <- Seq(0.3, 0.8, 0.95)) {
      val got = Similarity.recallSeeds(t, bits)
      assert(got.length == expected(t, bits, 0.8, 5), s"t=$t bits=$bits -> $got")
      assert(got == (0 until got.length).map(7L + _), s"seed ladder broke: $got")
    }
    // more bits split pairs more often -> never FEWER seeds
    val counts = Seq(4, 6, 8, 10, 12).map(b => Similarity.recallSeeds(0.8, b).length)
    assert(counts == counts.sorted, s"not monotone in bits: $counts")
    // the gate constants pinned in the oracles: 3 seeds at bits=4 for both
    // threshold 0.3 (pairs gate) and 0.5 (decontamination gate)
    assert(Similarity.recallSeeds(0.3, 4) == Seq(7L, 8L, 9L))
    assert(Similarity.recallSeeds(0.5, 4) == Seq(7L, 8L, 9L))
  }

  test("lshRecall closed form; the 5-seed cap binds past 8 bits and the docs say so") {
    // the closed form: 1 - (1 - (1-acos(sim)/pi)^bits)^seeds
    def ref(sim: Double, bits: Int, s: Int): Double = {
      val p = math.pow(1.0 - math.acos(sim) / math.Pi, bits)
      1.0 - math.pow(1.0 - p, s)
    }
    for (sim <- Seq(0.9, 0.95, 0.99, 0.999); bits <- Seq(4, 8, 16, 24); s <- Seq(1, 3, 5))
      assert(math.abs(Similarity.lshRecall(sim, bits, s) - ref(sim, bits, s)) < 1e-12)
    // monotone the right ways: more seeds help, more bits hurt
    assert(Similarity.lshRecall(0.9, 8, 3) > Similarity.lshRecall(0.9, 8, 1))
    assert(Similarity.lshRecall(0.9, 16, 5) < Similarity.lshRecall(0.9, 8, 5))
    // THE HONESTY PIN: at the 0.9-grade anchor the capped policy meets
    // the 0.8 target through bits = 8 and misses from bits = 9 on — the
    // policy docstring's cap discussion must stay true to this boundary
    assert(Similarity.lshRecall(0.9, 8, Similarity.recallSeeds(0.9, 8).length) >= 0.8)
    assert(Similarity.recallSeeds(0.9, 9).length == 5, "cap expected to bind at bits=9")
    assert(Similarity.lshRecall(0.9, 9, 5) < 0.8)
    assert(Similarity.lshRecall(0.9, 24, 5) < 0.15) // wide codes shed the 0.9 band...
    assert(Similarity.lshRecall(0.999, 24, 5) > 0.99) // ...but keep near-exact pairs
  }
}
