package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints exactly one JSON line the driver parses into BENCH_r{N}.json.
  *
  * Uses GraftSession so bench runs see the SAME configs (AQE, shuffle
  * partitions = SPARK_GRAFT_CPUS, zstd, UTC) as the library and tests.
  *
  * Measurement protocol (round 6 — makes host/JIT noise legible instead
  * of debatable): per query, 1 untimed warm-up run pays Janino
  * whole-stage + custom-expression codegen (measured: 6.7 s cold vs
  * 0.9 s steady for the MinHash pipeline — a fixed per-JVM cost, not
  * throughput), then N=5 timed runs. Reported per-query time is the
  * MEDIAN of the 5; the JSON also carries per-query IQR (p75 − p25 of
  * the same 5 samples) under "queries_iqr" plus "samples", so a
  * round-over-round delta can be read against dispersion: a shift
  * inside the IQR band is noise, outside it is a plan change.
  *
  * Self-defense (round 12, granularity fixed round 13): the artifact
  * carries a HOST-CONTENTION sentinel — a fixed-cost calibration stage +
  * /proc/loadavg read bracketing EACH SECTION (sf0.1 headline, sf0.1
  * pipeline, sf1 headline, sf1 pipeline), not just the whole run. A
  * section is flagged noisy when its calibration brackets drift >2x, or
  * >1.4x with the loadavg delta also exceeding ncores/8 (see
  * [[sectionNoisy]] for why the load term is calibration-gated);
  * "noisy_host" is true when ANY
  * section (or the run-long bracket) trips. Round 12's artifact showed
  * why run-long granularity is one notch too coarse: co-tenant load
  * arrived during the sf1 section (~2x the idle floor) while the
  * whole-run calibration drift stayed at 1.58x — under the 2x bar.
  * Per-query IQR still rides each section ("*_noisy_iqr") for load that
  * arrives AND leaves inside one section. The sf1 ramp is GENERATED
  * when missing (with a `.source` marker keyed to the input dir), so the
  * artifact can no longer silently drop its sf1 section on a fresh
  * checkout.
  */
object Bench {
  /** 3-decimal JSON number, Locale.ROOT: an f-interpolator uses the JVM
    * default locale, so a de_DE host would print "0,215" and corrupt the
    * one JSON line the driver parses into BENCH_r{N}.json. */
  private def d3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  /** Headline subset: one representative per operator family (agg, join,
    * window top-k, sort-limit, dedup exact/fuzzy/vector, ANN, text,
    * sessionization, centroid, connector scan). Full inventory runs in
    * Verify. */
  val headline: Seq[String] = Seq(
    "q1_agg", "q_join_pricing", "q3_shipping", "q_topk_orders",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_cosine", "q_dedup_cosine_lsh",
    "q_dedup_cosine_lsh_ms",
    "q_ann_topk", "q_text_stats", "q_sessionize", "q_vec_centroid",
    "q_connector_qdrant")

  /** LLM-pipeline heavies (round 13): the operator families that grew past
    * the original 13-query board — chunk+embed, perplexity scoring,
    * image-hash near-dedup, tar-shard round trip, semantic
    * decontamination. Measured as their own SECTION at both scales so a
    * regression in the newest families is visible between rounds instead
    * of only in Verify wall-clock.
    *
    * Round 17: `q_mm_ahash_neardup` RETIRED from this board — the r16
    * probe attributed ~70% of its row to fixture PNG encode + decode,
    * not the operator (BASELINE.md note). Successors measure the two
    * costs separately: `q_mm_fixture_features` = the synthetic-image
    * encode + real decode + feature extraction; `q_mm_ahash_neardup_v2`
    * = the banded Hamming join ALONE over a feature table materialized
    * once per input dir (built during the untimed warm-up pass, read by
    * every timed sample — the production shape, where fingerprints are
    * a persisted narrow table, not re-decoded per query). */
  val pipelineHeadline: Seq[String] = Seq(
    "q_chunk_embed", "q_text_perplexity", "q_mm_fixture_features",
    "q_mm_ahash_neardup_v2", "q_wds_roundtrip", "q_decontaminate_semantic")

  /** Feature table for `q_mm_ahash_neardup_v2`, materialized once per
    * input dir under target/ with a `.source` marker (the [[ensureSf1]]
    * pattern): the join row must not re-pay the encode per sample. */
  private def mmFeatures(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.col
    val out = s"target/bench_mm_feats_${java.lang.Integer.toHexString(dir.hashCode)}"
    val marker = Paths.get(s"$out.source")
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker)).trim == dir
    if (!fresh) {
      // size-proportional output files (r20, guide §6): the feature frame
      // inherits the imageTable spread's 32 partitions, which landed 32
      // near-empty files under a ~16-byte/row table; one file per 150k
      // rows (the BenchGen fact-table sizing) keeps file count
      // proportional to bytes. repartition, NOT coalesce — coalesce(1)
      // would fold the fused image encode+decode into one task, while the
      // narrow post-feature rows are nearly free to shuffle. (documents
      // count is parquet metadata — free)
      val rows = Tables(s, dir, "documents").count()
      val nFiles = math.max(1L, math.min(
        2L * s.sparkContext.defaultParallelism, (rows + 149999) / 150000)).toInt
      graft.ops.Multimodal.extractImageFeatures(
          graft.ops.Multimodal.imageTable(Tables(s, dir, "documents")))
        .select(col("media_id"), col("ahash"))
        .repartition(nFiles)
        .write.mode("overwrite").parquet(out)
      Files.write(marker, (dir + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    s.read.parquet(out)
  }

  /** Bench-only queries: production-kernel configurations whose output
    * has no SQL-replayable twin, kept OUT of the oracle-gated
    * `SparkEntry.queries` (a rows-only gate reads as a perpetual `err`
    * row on the driver scoreboard). The oracle-adjudicated faces of the
    * same operator live in PipelineQueries (`q_dedup_minhash_planted` /
    * `_oph` / `_portable`). */
  val benchOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    // full-corpus MinHash near-dedup on the xxhash64 production kernel
    "q_dedup_minhash" -> ((s, dir) =>
      graft.ops.Dedup.minHashDuplicatePairs(Tables(s, dir, "documents"), threshold = 0.3)),
    // the SCALE path for embedding near-dedup: hyperplane-LSH blocking
    // with the bit width derived from the corpus size, so candidate work
    // stays linear where the gated label-blocked q_dedup_cosine (fixed
    // block cardinality) goes quadratic — the sf1 ramp exists to keep
    // this delta visible. Deliberately SHADOWS the gated fixed-bits
    // q_dedup_cosine_lsh here (benchOnly wins in `qs`): the gate pins
    // bits=4 so its oracle can inline the planes, while the bench must
    // scale bits with the corpus or sf1 re-creates the quadratic it exists
    // to catch.
    "q_dedup_cosine_lsh" -> ((s, dir) =>
      // single-seed PINNED: the historical floor, directly comparable to
      // the BASELINE.md row at every round
      graft.ops.Similarity.lshCosinePairsAuto(
        Tables(s, dir, "embeddings"), threshold = 0.3, seeds = Seq(7L))),
    // the recall-targeted MULTI-SEED DEFAULT (Similarity.recallSeeds —
    // seed count derives from threshold + corpus-scaled bits): what a
    // production caller gets with no seed argument. Measured as its own
    // row so the default's linear |seeds|× cost is a priced, visible
    // choice — not a silent regression on the pinned floor above.
    // Shadows the gated q_dedup_cosine_lsh_ms (fixed bits=4 for the SQL
    // oracle) for the same reason q_dedup_cosine_lsh shadows its gate:
    // the bench must scale bits with the corpus.
    "q_dedup_cosine_lsh_ms" -> ((s, dir) =>
      graft.ops.Similarity.lshCosinePairsAuto(
        Tables(s, dir, "embeddings"), threshold = 0.3)),
    // fixture-cost row: synthetic PNG encode + real javax.imageio decode +
    // feature extraction — the measurement-honesty split of the retired
    // q_mm_ahash_neardup row (this was ~70% of it at sf1)
    "q_mm_fixture_features" -> ((s, dir) =>
      graft.ops.Multimodal.extractImageFeatures(
        graft.ops.Multimodal.imageTable(Tables(s, dir, "documents")))),
    // operator row: the banded Hamming near-dup join ALONE, over the
    // pre-materialized fingerprint table ([[mmFeatures]])
    "q_mm_ahash_neardup_v2" -> ((s, dir) =>
      graft.ops.Multimodal.aHashNearDupPairs(mmFeatures(s, dir), maxHamming = 3)),
    // tar-shard round trip with the shard dir on TMPFS when the host has
    // one (round 18, closing the r17 "most IO-exposed row" note): the
    // gated twin writes under target/ and its bench reading spread
    // 0.85 → 13.3 s purely with host IO state, poisoning loaded-host
    // artifacts. The bench row measures the OPERATOR — tar framing,
    // shard partitioning, stream decode — not the co-tenant disk queue;
    // the disk-bound law stays visible in ScaleProbe ("wds shard
    // roundtrip") and the oracle gate still runs the target/-backed
    // path. Shadows the gated q_wds_roundtrip here (benchOnly wins in
    // `qs`), same pattern as the q_dedup_cosine_lsh shadow.
    "q_wds_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val samples = Tables(s, dir, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id").cast("string").as("key"),
          map(lit("txt"), encode(col("text"), "UTF-8")).as("files"))
      graft.ops.WebDataset.writeShards(samples, wdsBenchDir, numShards = 8,
        overwrite = true)
      graft.ops.WebDataset.readShards(s, s"$wdsBenchDir/*.tar")
        .select(col("key"), col("shard"), col("ext"), col("byte_len"))
    }))

  /** Shard dir for the bench's q_wds_roundtrip row: /dev/shm (tmpfs) when
    * writable, else the gate's target/-style scratch. PID-suffixed so two
    * concurrent bench JVMs cannot clobber each other's shards mid-read;
    * deleted when the run ends — success OR crash ([[cleanupWds]] rides a
    * finally in main) — because tmpfs is RAM and a bench must not leave a
    * corpus copy pinned in a shared host's memory. */
  private val wdsBenchDir: String = {
    val base =
      if (java.nio.file.Files.isWritable(java.nio.file.Paths.get("/dev/shm")))
        "/dev/shm/graft_bench_wds"
      else "target/tmp/wds_bench"
    s"${base}_${ProcessHandle.current().pid()}"
  }

  private def cleanupWds(): Unit = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(wdsBenchDir)
    if (Files.isDirectory(root)) {
      val walk = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse.foreach(p =>
          try Files.deleteIfExists(p) catch { case _: Throwable => () })
      } finally walk.close()
    }
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
  private def iqr(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length * 3 / 4) - s(s.length / 4)
  }

  /** Fixed-cost calibration job: 32M codegen'd hashes + one aggregate —
    * the same resource profile (all-core CPU through a Spark stage) the
    * bench queries contend for, with ZERO data dependence. Run once warm
    * before the first measurement and once after the last: any drift is
    * the HOST's, not the code's. */
  def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(1L << 25).selectExpr("sum(xxhash64(id))").collect()
    (System.nanoTime() - t0) / 1e9
  }

  /** Fixed-cost IO-state probe: scan one pinned parquet table and sum a
    * column. The CPU calibration job is deliberately data-free, so it
    * CANNOT see page-cache / IO-scheduler drift — round 16 measured
    * three sentinel-clean runs spreading 18.4–19.9 s at sf1 with
    * calibrations flat at 0.05–0.095 s, i.e. the spread lived entirely
    * in the IO axis. This probe brackets the whole run (`io_first_sec`/
    * `io_last_sec` in the artifact, INFO-ONLY — page-cache warmth
    * legitimately differs between a fresh host and a warmed one, so it
    * explains cross-round deltas rather than flagging them). */
  def ioCalibrate(spark: SparkSession, sfDir: String): Double = {
    val t0 = System.nanoTime()
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("sum(l_quantity)").collect()
    catch { case _: Throwable => () }
    (System.nanoTime() - t0) / 1e9
  }

  /** Min of 3 calibration runs: ONE sample is disturbed by the JVM's own
    * state — a GC or JIT deopt right after a heavy section inflated a
    * post-bracket 4× on a QUIET host (round-13 false positive: sf1
    * section flagged at calib 0.08 → 0.33 with loadavg 1.2 → 1.5). The
    * min is robust to self-inflicted pauses while staying honest about
    * co-tenancy: sustained external load inflates every sample, so the
    * min stays high and the 2× drift bar still trips (the sentinel spec
    * drives real spinner load against exactly this reading). */
  def calibrateMin3(spark: SparkSession): Double =
    (1 to 3).map(_ => calibrate(spark)).min

  /** Uniform co-tenant load slows first and last calibration differently
    * than the fixed-cost work predicts; >2x drift between them marks the
    * whole artifact suspect. (Round 11's driver artifact was 5x inflated
    * by exactly this; the per-query IQR self-report cannot see a
    * run-long uniform slowdown — bracketing calibration can.) */
  def noisyHost(first: Double, last: Double): Boolean = drift(first, last) > 2.0

  /** Symmetric calibration-drift ratio (≥1); shared by the run-long
    * bracket and the per-section sentinel so their bars can never
    * silently diverge. */
  private[graft] def drift(a: Double, b: Double): Double =
    math.max(a, b) / math.max(1e-9, math.min(a, b))

  private def loadAvg1m(): Double =
    try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  /** Per-section sentinel readings: calibration + loadavg + IO probe
    * bracketing ONE measured section, plus the section's own dispersion
    * health (`iqrNoisy`: any query with IQR > median — not a
    * measurement). The dispersion term folds into `noisy` so a "clean"
    * section can never carry garbage medians: round 15's sf1 section
    * passed the calibration bars while holding two IQR>4x-median rows.
    *
    * IO readings (round 17, closing the r16 drift question): the CPU
    * calibration is data-free and blind to page-cache / IO-scheduler
    * state — r16 measured three "clean" runs spreading 18.4–19.9 s at
    * sf1 with calibrations flat, the spread living in the IO axis. Each
    * section now brackets a fixed parquet scan of ITS OWN input dir
    * (warm by bracket time: the untimed warm-up pass reads the tables
    * first), and `ioNoisy` — IO drift > 2.5x across the section — folds
    * into `noisy`: IO state changing UNDER a section means its medians
    * mix two IO regimes. Negative io readings (probe failed) disable
    * the term. */
  private[graft] case class SectionStats(calibPre: Double, calibPost: Double,
                                         loadPre: Double, loadPost: Double,
                                         iqrNoisy: Boolean = false,
                                         ioPre: Double = -1.0,
                                         ioPost: Double = -1.0,
                                         steady: Double = -1.0) {
    def ioNoisy: Boolean = ioPre > 0 && ioPost > 0 && drift(ioPre, ioPost) > 2.5
    /** SUSTAINED-pressure term (round-17 study): constant co-tenant load
      * leaves both brackets ELEVATED but AGREEING — drift, IQR, and IO
      * bars are all structurally blind to it (study run 3: every bracket
      * stable at ~2x the idle floor, sf1 pipeline 75% inflated,
      * unflagged). The signature is the section's BETTER bracket sitting
      * far above the run's own steady-state warm-up calibration: JIT
      * maturation only ever LOWERS later calibrations, so min(brackets)
      * > 2x steady means external pressure, not JVM state. A run that
      * STARTS contended carries an elevated steady and this term cannot
      * see it — that case is only legible against cross-round floors,
      * which is why `calib_steady_sec` rides the artifact. */
    def sustained: Boolean =
      steady > 0 && math.min(calibPre, calibPost) > 2.0 * steady
    def noisy: Boolean = sectionNoisy(this) || iqrNoisy || ioNoisy || sustained
    def json: String =
      s"""{"calib_pre":${d3(calibPre)},"calib_post":${d3(calibPost)},""" +
        s""""load_pre":$loadPre,"load_post":$loadPost,""" +
        s""""io_pre":${d3(ioPre)},"io_post":${d3(ioPost)},""" +
        s""""iqr_noisy":$iqrNoisy,"io_noisy":$ioNoisy,""" +
        s""""sustained":$sustained,"noisy":$noisy}"""
  }

  /** Any query whose dispersion exceeds its median taints the section. */
  private[graft] def hasIqrNoise(r: Seq[(String, Double, Double)]): Boolean =
    r.exists { case (_, med, iq) => iq > med }

  /** A section is contention-suspect when its own calibration brackets
    * drift >2x (co-tenant CPU visible to an all-core fixed-cost job), OR
    * when a SOFTER calibration drift (>1.4x) coincides with the 1-minute
    * loadavg rising past ncores/8 across the section — the round-12 sf1
    * shape (loadavg 1.67 → 5.11 on 32 cores at only 1.58x drift, ~2x
    * inflated timings). The load term is DELIBERATELY gated on the soft
    * calibration bar: 1-minute loadavg integrates the bench's OWN
    * all-core stages, so on a small or fully-saturated host the delta
    * alone would flag an idle machine — but self-load cannot inflate the
    * POST calibration (brackets run after the section's jobs finish), so
    * requiring both makes the term self-load-immune. Loadavg readings of
    * -1 (no /proc) disable the load term. */
  private[graft] def sectionNoisy(s: SectionStats): Boolean = {
    val d = drift(s.calibPre, s.calibPost)
    d > 2.0 ||
      (d > 1.4 && s.loadPre >= 0 && s.loadPost >= 0 &&
        s.loadPost - s.loadPre > Runtime.getRuntime.availableProcessors() / 8.0)
  }

  /** Run `body` bracketed by its own calibration + loadavg + (when
    * `ioDir` is given) IO-probe reads. Each bracket is a min-of-3
    * calibration ([[calibrateMin3]]) so the JVM's own post-section GC
    * state cannot fake a contention flag; the IO probe is a single scan
    * of the section's own input dir (already warm — see SectionStats). */
  private[graft] def bracketed[A](spark: SparkSession, ioDir: Option[String] = None,
                                  steady: Double = -1.0)
                                 (body: => A): (A, SectionStats) = {
    val lp = loadAvg1m()
    val ip = ioDir.map(d => ioCalibrate(spark, d)).getOrElse(-1.0)
    val cp = calibrateMin3(spark)
    val a = body
    val cq = calibrateMin3(spark)
    val iq = ioDir.map(d => ioCalibrate(spark, d)).getOrElse(-1.0)
    val lq = loadAvg1m()
    (a, SectionStats(cp, cq, lp, lq, ioPre = ip, ioPost = iq, steady = steady))
  }

  /** The sf1 ramp directory, GENERATING it when absent — round 11's
    * artifact silently lost its sf1 section because the driver's fresh
    * checkout had no `target/sf1` (gitignored) and Bench only ramped when
    * it existed. A `.source` marker records what the ramp was built from,
    * so switching SPARK_GRAFT_SF_DIR (e.g. local sf0.01 iteration vs the
    * driver's sf0.1) rebuilds instead of silently reusing a stale ramp.
    * `SPARK_GRAFT_SF1=off` skips the ramp entirely. */
  /** @return (ramp dir if usable, generated-this-run, error). A
    *         generation failure is NOT swallowed into a bare missing
    *         section: the error rides the artifact as `sf1_error`, so a
    *         ramp-less BENCH_rN.json always says WHY. */
  private[graft] def ensureSf1(spark: SparkSession, srcDir: String,
                               rampDir: String = "target/sf1")
      : (Option[String], Boolean, Option[String]) = {
    import java.nio.file.{Files, Paths}
    if (sys.env.get("SPARK_GRAFT_SF1").contains("off")) return (None, false, None)
    sys.env.get("SPARK_GRAFT_SF1_DIR") match {
      case Some(d) if Files.exists(Paths.get(d)) => (Some(d), false, None)
      case Some(d) =>
        // an EXPLICIT override that can't be honored must fail loudly —
        // silently measuring a self-generated ramp instead of the dataset
        // the operator pointed at is the exact substitution this method
        // exists to prevent
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_SF1_DIR=$d does not exist; fix the path or unset it " +
            "(unset -> the ramp auto-generates into target/sf1)")
      case None =>
        val d = rampDir
        val marker = Paths.get(d, ".source")
        val want = s"$srcDir x10 v${BenchGen.rampVersion}"
        val fresh = Files.exists(marker) &&
          new String(Files.readAllBytes(marker)).trim == want
        if (fresh) (Some(d), false, None)
        else try {
          BenchGen.replicate(spark, srcDir, d, 10)
          Files.write(marker, (want + "\n").getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          (Some(d), true, None)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] sf1 ramp generation failed: ${e.getMessage}")
            (None, false, Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"))
        }
    }
  }

  /** Warm-up protocol: every measured query once, untimed (JIT/codegen).
    * Runs BEFORE the section's calibration bracket — the first heavy
    * query pass is what matures the JVM from ~2.4x-steady calibration
    * down to steady, and a bracket that spans the maturation reads it as
    * co-tenant drift (round-16: calib_pre 0.135 vs post 0.055 on a
    * PROVABLY idle host, structurally flagging every first section). */
  private def warmup(spark: SparkSession, sfDir: String,
                     queryNames: Seq[String]): Unit = {
    val qs = SparkEntry.queries ++ benchOnly
    queryNames.filter(qs.contains).foreach { name =>
      try qs(name)(spark, sfDir).count() catch { case _: Throwable => () }
    }
  }

  /** TIMED samples only — call [[warmup]] first, outside the bracket. */
  private def measure(spark: SparkSession, sfDir: String, samples: Int,
                      queryNames: Seq[String]): Seq[(String, Double, Double)] = {
    val qs = SparkEntry.queries ++ benchOnly
    val names = queryNames.filter(qs.contains)
    names.map { name =>
      val times = (1 to samples).map { _ =>
        val t0 = System.nanoTime()
        try qs(name)(spark, sfDir).count() catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      (name, median(times), iqr(times))
    }
  }

  private def jsonMaps(results: Seq[(String, Double, Double)]): (String, String) = {
    def m(f: ((String, Double, Double)) => String): String =
      results.map(f).mkString("{", ",", "}")
    (m { case (k, v, _) => "\"" + k + "\":" + d3(v) },
      m { case (k, _, i) => "\"" + k + "\":" + d3(i) })
  }

  /** A query whose dispersion exceeds its median is not a measurement —
    * name the offenders so the artifact carries its own health check. */
  private def noisyIqrJson(key: String, r: Seq[(String, Double, Double)]): String = {
    val noisy = r.collect { case (n, med, iq) if iq > med => n }
    if (noisy.isEmpty) ""
    else s""","$key":${noisy.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
  }

  def main(args: Array[String]): Unit = try mainImpl(args) finally cleanupWds()

  private def mainImpl(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val samples = sys.env.getOrElse("SPARK_GRAFT_BENCH_SAMPLES", "5").toInt
    val spark = GraftSession.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    // warm the calibration job to STEADY state (untimed): a single
    // warm-up run leaves the first bracket ~2.5-3x the late-run cost on a
    // PROVABLY idle host (measured 3.31 -> 0.22 -> ... -> 0.12 over 12
    // fresh-JVM runs; late-bench steady state is ~0.08 once the heavy
    // sections mature the JIT) — JVM maturation would structurally fake
    // the first section's 2x drift bar without this. ADAPTIVE: a fixed
    // 8 rounds still left calib_pre at 2.2x steady on an idle host
    // (round-16 run, load 0.54), so warm until two consecutive
    // calibrations agree within 1.3x (bounded — a genuinely loaded host
    // never converges and the section brackets flag it instead)
    // at least the historical 8 rounds (an early JIT PLATEAU can satisfy
    // the convergence test while still far above steady), then extend
    // adaptively until two consecutive calibrations agree within 1.3x
    var wPrev = calibrate(spark)
    var wCur = calibrate(spark)
    var warmups = 2
    while (warmups < 20 && (warmups < 8 || drift(wPrev, wCur) > 1.3)) {
      wPrev = wCur; wCur = calibrate(spark); warmups += 1
    }
    // the run's steady-state calibration: the sustained-pressure bar for
    // every section, and a legible record of the START state (an elevated
    // steady = the run began contended; judge it against cross-round
    // floors, not its own brackets)
    val calibSteady = wCur
    val loadBefore = loadAvg1m()
    val ioFirst = { ioCalibrate(spark, sfDir); ioCalibrate(spark, sfDir) } // warm once, read second
    // each SECTION rides its own calibration/loadavg bracket (round 13) —
    // run-long brackets missed round 12's late-arriving sf1 co-tenant
    warmup(spark, sfDir, headline)
    val (results, stHead) =
      bracketed(spark, Some(sfDir), calibSteady)(measure(spark, sfDir, samples, headline))
    val calibFirst = stHead.calibPre
    val (qjson, ijson) = jsonMaps(results)
    val total = results.map(_._2).sum
    // the sf0.1 headline gets the same dispersion health-check key every
    // other section carries (absent when every IQR < its median)
    val headNoisy = noisyIqrJson("noisy_iqr", results)
    // LLM-pipeline heavies: their own section at the same scale
    val (resPipe, stPipe) =
      { warmup(spark, sfDir, pipelineHeadline)
        bracketed(spark, Some(sfDir), calibSteady)(
          measure(spark, sfDir, samples, pipelineHeadline)) }
    val (pq, pi) = jsonMaps(resPipe)
    val pipeJson =
      s""","pipeline_total":${d3(resPipe.map(_._2).sum)},"pipeline_queries":$pq,""" +
        s""""pipeline_queries_iqr":$pi""" + noisyIqrJson("pipeline_noisy_iqr", resPipe)
    // Scale ramp: the materialized sf1 dataset (see [[BenchGen]] — 10x,
    // replicas de-correlated so dedup stays linear) is GENERATED when
    // absent, so the artifact can never silently ship without its sf1
    // section; the same headline queries run there and ride the same
    // JSON line under sf1_* keys. The sf0.1 board stopped discriminating
    // (every query well under baseline), so plan regressions are expected
    // to surface at sf1 first.
    val (sf1Dir, sf1Generated, sf1Error) = ensureSf1(spark, sfDir)
    // full JSON string escaping: Spark exception messages carry newlines
    // and tabs, and one raw control char makes the whole artifact line
    // unparseable — the exact failure the file-landing exists to avoid
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sf1ErrJson = sf1Error.map(e => s""","sf1_error":${jstr(e)}""").getOrElse("")
    var sf1Sections = Map.empty[String, SectionStats]
    val sf1Json = sf1Dir.map { d =>
      // ≥5 samples: the round-10 artifact carried 3-sample medians with
      // IQR > median on 3 queries — statistically unusable. 5 is the floor;
      // SPARK_GRAFT_SF1_SAMPLES can only raise it.
      val s1 = math.max(5, sys.env.getOrElse("SPARK_GRAFT_SF1_SAMPLES", "5").toInt)
      warmup(spark, d, headline)
      val (r1, st1) =
        bracketed(spark, Some(d), calibSteady)(measure(spark, d, s1, headline))
      val (q1, i1) = jsonMaps(r1)
      warmup(spark, d, pipelineHeadline)
      val (rp1, stp1) =
        bracketed(spark, Some(d), calibSteady)(measure(spark, d, s1, pipelineHeadline))
      val (qp1, ip1) = jsonMaps(rp1)
      sf1Sections = Map("sf1" -> st1.copy(iqrNoisy = hasIqrNoise(r1)),
        "sf1_pipeline" -> stp1.copy(iqrNoisy = hasIqrNoise(rp1)))
      s""","sf1_total":${d3(r1.map(_._2).sum)},"sf1_queries":$q1,""" +
        s""""sf1_queries_iqr":$i1,"sf1_samples":$s1,"sf1_dir":"$d"""" +
        s""","sf1_generated":$sf1Generated""" + noisyIqrJson("sf1_noisy_iqr", r1) +
        s""","sf1_pipeline_total":${d3(rp1.map(_._2).sum)}""" +
        s""","sf1_pipeline_queries":$qp1,"sf1_pipeline_queries_iqr":$ip1""" +
        noisyIqrJson("sf1_pipeline_noisy_iqr", rp1)
    }.getOrElse("") + sf1ErrJson
    // run-long bracket kept for continuity with r12 artifacts; the
    // per-section brackets above are the authoritative sentinel
    val calibLast = calibrateMin3(spark)
    val ioLast = ioCalibrate(spark, sfDir)
    val loadAfter = loadAvg1m()
    val sections = Map(
      "sf_headline" -> stHead.copy(iqrNoisy = hasIqrNoise(results)),
      "sf_pipeline" -> stPipe.copy(iqrNoisy = hasIqrNoise(resPipe))) ++ sf1Sections
    val sectionsJson = sections.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v.json }.mkString("{", ",", "}")
    val noisySections = sections.toSeq.sortBy(_._1).collect { case (k, v) if v.noisy => k }
    val anyNoisy = noisyHost(calibFirst, calibLast) || noisySections.nonEmpty
    val sentinel =
      s""","calib_first_sec":${d3(calibFirst)},"calib_last_sec":${d3(calibLast)}""" +
        s""","calib_steady_sec":${d3(calibSteady)}""" +
        s""","io_first_sec":${d3(ioFirst)},"io_last_sec":${d3(ioLast)}""" +
        s""","load_1m_before":$loadBefore,"load_1m_after":$loadAfter""" +
        s""","sections":$sectionsJson""" +
        s""","noisy_sections":${noisySections.map("\"" + _ + "\"").mkString("[", ",", "]")}""" +
        s""","noisy_host":$anyNoisy"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,""" +
      s""""queries_iqr":$ijson,"samples":$samples,"sf":"$sfDir"$headNoisy$pipeJson$sf1Json$sentinel}"""
    println(line)
    // Also land the JSON in a file: sbt interleaves log noise into stdout,
    // which has left the driver's `parsed` field null before.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    sys.exit(0) // don't let stray library threads pin the forked JVM open
  }
}
