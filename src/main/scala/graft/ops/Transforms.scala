package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.model.Canonical

/** The user-transform surface (reference T1, `core/migrator.py:79-87`):
  * declared column transforms for the common cases, plus a row-map escape
  * hatch for arbitrary per-record logic — the two tiers SURVEY §2 calls
  * for. Transforms compose with `andThen` and plug into
  * [[graft.core.Migrator.run]].
  */
object Transforms {

  /** The reference's example transform (`examples/add_source_tracking.py:
    * 12-47`): stamp provenance into metadata. `timestamp` is an explicit
    * argument — a deterministic pipeline beats `datetime.now()` inside the
    * transform. */
  def addSourceTracking(sourceDb: String, timestamp: String): DataFrame => DataFrame =
    df => df.withColumn(Canonical.METADATA,
      // filter first: re-running the transform (a resumed migration) or
      // input that already carries these keys would otherwise throw
      // DUPLICATE_MAP_KEY under Spark's default EXCEPTION dedup policy —
      // a stamp transform must be idempotent (latest stamp wins)
      map_concat(
        map_filter(col(Canonical.METADATA),
          (k, _) => k =!= "source_db" && k =!= "migration_timestamp"),
        map(lit("source_db"), lit(sourceDb),
          lit("migration_timestamp"), lit(timestamp))))

  /** Keep only records whose metadata key matches a predicate expression
    * (the drop-items use documented in `README.md:160-192`). */
  def filterByMetadata(sqlPredicate: String): DataFrame => DataFrame =
    df => df.filter(expr(sqlPredicate))

  /** Rename a metadata key (no-op when absent; an existing `to` key is
    * OVERWRITTEN — without filtering it, a rename onto an occupied key
    * threw DUPLICATE_MAP_KEY under the default EXCEPTION dedup policy). */
  def renameMetadataKey(from: String, to: String): DataFrame => DataFrame =
    df => df.withColumn(Canonical.METADATA, {
      val without = map_filter(col(Canonical.METADATA),
        (k, _) => k =!= from && k =!= to)
      when(map_contains_key(col(Canonical.METADATA), from),
        map_concat(without, map(lit(to), element_at(col(Canonical.METADATA), from))))
        .otherwise(col(Canonical.METADATA))
    })

  /** L2-normalize the vector column (modify-vectors use). */
  def normalizeVectors: DataFrame => DataFrame =
    df => df.withColumn(Canonical.VECTOR,
      transform(graft.functions.VectorFunctions.normalize(col(Canonical.VECTOR)),
        _.cast("float")))

  /** Heuristic quality gate over `metadata[textKey]`: keep records whose
    * [[graft.functions.TextFunctions.qualityScore]] clears `minScore`;
    * records without text pass through untouched. Pure per-row filter —
    * no shuffle. */
  def qualityGate(minScore: Double, textKey: String = "text"): DataFrame => DataFrame = { df =>
    val text = element_at(col(Canonical.METADATA), textKey)
    val hasText = col(Canonical.METADATA).isNotNull && text.isNotNull
    df.filter(!hasText || graft.functions.TextFunctions.qualityScore(text) >= minScore)
  }

  /** Exact near-identity dedup on the token stream of `metadata[textKey]`
    * (whitespace-insensitive portable rolling fingerprint; lowest id
    * survives, so re-runs are stable). Only text rows enter the
    * fingerprint window — no single hot null-fingerprint partition. One
    * shuffle on the fingerprint. */
  /** Canonicalize a URL metadata key in place ([[Urls.canonicalizeUrl]]:
    * fragment/case/default-port/tracking-param/param-order normalization)
    * and optionally DEDUP by the canonical URL keeping the lowest id —
    * the first dedup a crawl pipeline runs, before any content hashing.
    * Records without the key pass through untouched. */
  def canonicalizeUrls(urlKey: String = "url",
                       dedup: Boolean = false): DataFrame => DataFrame = { df =>
    val url = element_at(col(Canonical.METADATA), urlKey)
    val hasUrl = col(Canonical.METADATA).isNotNull && url.isNotNull
    val canon = df.withColumn(Canonical.METADATA,
      when(hasUrl, map_concat(
        map_filter(col(Canonical.METADATA), (k, _) => k =!= urlKey),
        map(lit(urlKey), Urls.canonicalizeUrl(url))))
        .otherwise(col(Canonical.METADATA)))
    if (!dedup) canon
    else {
      // key computed ONCE into a temp column (the house __fp pattern —
      // the canonicalization chain is a dozen regexps; re-evaluating it
      // as the window key would run it several times per row). Blank /
      // whitespace urls are NOT a dedup group: collapsing "no real url"
      // records into one survivor would silently destroy data (and pile
      // them all onto one hot window partition first).
      val keyed = canon.withColumn("__cu",
        element_at(col(Canonical.METADATA), urlKey))
      val dedupable = col("__cu").isNotNull && trim(col("__cu")) =!= ""
      val deduped = keyed.filter(dedupable)
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("__cu")).orderBy(col(Canonical.ID))))
        .filter(col("__rk") === 1)
        .drop("__rk")
      keyed.filter(!dedupable).unionByName(deduped).drop("__cu")
    }
  }

  def exactDedupByText(textKey: String = "text"): DataFrame => DataFrame = { df =>
    val text = element_at(col(Canonical.METADATA), textKey)
    val hasText = col(Canonical.METADATA).isNotNull && text.isNotNull
    val deduped = df.filter(hasText)
      .withColumn("__fp", graft.functions.TextFunctions.rollingHashPortable(text))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__fp")).orderBy(col(Canonical.ID))))
      .filter(col("__rk") === 1)
      .drop("__fp", "__rk")
    df.filter(!hasText).unionByName(deduped)
  }

  /** [[exactDedupByText]] with BEST-representative election: within each
    * group of identical token streams keep the record with the highest
    * score — `metadata[scoreKey]` as a double when given, else the
    * heuristic [[graft.functions.TextFunctions.qualityScore]] — ties →
    * lowest id. The config-pipeline face of [[Dedup.collapseKeepBest]];
    * same one-shuffle window shape as the min-id variant. */
  def keepBestDedup(textKey: String = "text", scoreKey: String = ""): DataFrame => DataFrame = { df =>
    val text = element_at(col(Canonical.METADATA), textKey)
    val hasText = col(Canonical.METADATA).isNotNull && text.isNotNull
    val score =
      if (scoreKey.isEmpty) graft.functions.TextFunctions.qualityScore(text)
      else coalesce(element_at(col(Canonical.METADATA), scoreKey).cast("double"), lit(0.0))
    val deduped = df.filter(hasText)
      .withColumn("__fp", graft.functions.TextFunctions.rollingHashPortable(text))
      .withColumn("__s", score)
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("__fp"))
          .orderBy(col("__s").desc, col(Canonical.ID))))
      .filter(col("__rk") === 1)
      .drop("__fp", "__s", "__rk")
    df.filter(!hasText).unionByName(deduped)
  }

  /** Token-budget mixture over canonical records: keep a deterministic
    * per-source token budget ([[Sampling.mixToTokenBudget]]) where the
    * source is `metadata[sourceKey]`, tokens are the whitespace count of
    * `metadata[textKey]`, and the portable bucket derives from the string
    * id's rolling hash (canonical ids need not be numeric). Records from
    * sources absent in `shares` are dropped — this IS the mixture gate. */
  def mixTokenBudget(shares: Map[String, Double], totalTokens: Long,
                     sourceKey: String = "source", textKey: String = "text",
                     nBuckets: Int = 1024): DataFrame => DataFrame = { df =>
    val text = element_at(col(Canonical.METADATA), textKey)
    val prepared = df
      .withColumn("__src", element_at(col(Canonical.METADATA), sourceKey))
      .withColumn("__tok",
        when(text.isNull || length(trim(text)) === 0, 0L)
          .otherwise(size(split(trim(lower(text)), "\\s+")).cast("long")))
      .withColumn("__hid", graft.functions.TextFunctions.rollingHashPortable(col(Canonical.ID)))
    Sampling.mixToTokenBudget(prepared, "__src", shares, totalTokens,
      tokensCol = "__tok", idCol = "__hid", nBuckets = nBuckets)
      .drop("__src", "__tok", "__hid")
  }

  /** Chunk `metadata[textKey]` into token windows and embed each chunk
    * (deterministic hashing-trick encoder stand-in) — one canonical record
    * per chunk, id `<parent>#<idx>`, provenance in metadata. Records
    * without text pass through untouched, so re-running over a mixed
    * collection is safe. */
  def chunkAndEmbed(width: Int = 64, stride: Int = 48, dim: Int = 64,
                    textKey: String = "text"): DataFrame => DataFrame = { df =>
    val text = element_at(col(Canonical.METADATA), textKey)
    // "has text" means it TOKENIZES to something: a whitespace-only text
    // used to fall between the two branches (hasText routed it into the
    // chunker, whose empty-token filter removed it) and the record
    // silently vanished from the output
    val hasText = col(Canonical.METADATA).isNotNull && text.isNotNull &&
      graft.functions.TextFunctions.tokenCount(text) > 0
    val chunked = graft.ops.Chunking.chunkByTokens(
      df.filter(hasText)
        .withColumn("__parent", col(Canonical.ID))
        .withColumn("__text", text),
      width, stride, idCol = Canonical.ID, textCol = "__text")
    val out = chunked
      .withColumn(Canonical.ID,
        concat(col(Canonical.ID), lit("#"), col("chunk_idx")))
      .withColumn(Canonical.VECTOR,
        transform(
          graft.functions.TextFunctions.hashedTokenEmbedding(col("chunk_text"), dim),
          _.cast("float")))
      // parent_id/chunk_idx are filtered BEFORE re-adding: feeding a
      // previous run's chunks back in (the documented-safe re-run) would
      // otherwise DUPLICATE_MAP_KEY on them
      .withColumn(Canonical.METADATA, map_concat(
        map_filter(col(Canonical.METADATA),
          (k, _) => k =!= textKey && k =!= "parent_id" && k =!= "chunk_idx"),
        map(lit(textKey), col("chunk_text"),
          lit("parent_id"), col("__parent"),
          lit("chunk_idx"), col("chunk_idx").cast("string"))))
      .select(col(Canonical.ID), col(Canonical.VECTOR), col(Canonical.METADATA))
    df.filter(!hasText)
      .select(col(Canonical.ID), col(Canonical.VECTOR), col(Canonical.METADATA))
      .unionByName(out)
  }

  /** Row-map escape hatch: arbitrary per-record logic over the canonical
    * shape, distributed via mapPartitions — the full generality of the
    * reference's `transform(data) -> data` hook without materializing on
    * the driver. */
  def rowMap(f: CanonicalRecord => Option[CanonicalRecord]): DataFrame => DataFrame = { df =>
    val spark = df.sparkSession
    import spark.implicits._
    df.as[CanonicalRecord].mapPartitions(_.flatMap(r => f(r))).toDF()
  }

  /** LEXICAL decontamination as a declarative pipeline verb, with the
    * N-GRAM COLLISION rule the published web-scale pipelines use (GPT-3 /
    * PaLM style): DROP a record whose `metadata[textKey]` shares at least
    * `minHits` word `ngram`-grams with the benchmark corpus at
    * `evalPath`. Collision — not whole-document containment — is the
    * correct direction for a drop gate: a 20-word benchmark question
    * pasted into a 1,000-word page is 2% of the page's shingles (any
    * containment threshold that catches it drowns in false positives)
    * but is 13 distinct 8-gram collisions, which `minHits = 1` catches
    * outright.
    *
    * `bloom = true` (default) is a SINGLE PASS over the stream: the
    * benchmark's shingle hashes fold into a broadcast Bloom filter once,
    * and each record pays one codegen'd hit-count loop
    * ([[graft.functions.BloomHitCountExpr]]) — no explode, no join, no
    * second scan of a 100 TB source. One-sided error can only OVER-drop
    * (~`fpp` per probe; default 1e-6 ⇒ ~0.1% of 1,000-shingle docs — the
    * safe direction; lower `fpp` or use `bloom = false` when that
    * matters). The exact mode joins against the distinct benchmark
    * shingle set and anti-joins flagged ids (two passes, zero error).
    * Records without the text key pass through untouched. */
  def decontaminate(evalPath: String, ngram: Int = 8, minHits: Int = 1,
                    textKey: String = "text", evalTextCol: String = "text",
                    bloom: Boolean = true, expectedShingles: Long = 1000000L,
                    fpp: Double = 1e-6): DataFrame => DataFrame = { df =>
    require(minHits >= 1, "minHits must be >= 1")
    val bench = df.sparkSession.read.parquet(evalPath)
      .select(col(evalTextCol).as("__text"))
    val text = element_at(col(Canonical.METADATA), textKey)
    // FULL 64-bit shingle hashes: the MinHash family's mod-P (31-bit)
    // reduction would make chance collisions the false-drop floor
    // (~4.7e-4 per probe at 1e6 benchmark shingles -> ~37% of clean
    // 1,000-shingle docs dropped); at 64 bits the floor is ~5e-14 and
    // the Bloom fpp genuinely dominates, as the error analysis claims
    def shingles(c: org.apache.spark.sql.Column) =
      graft.functions.HashExpressions.wordShingleHashes64(c, ngram)
    if (bloom) {
      val filter = bench
        .select(explode(shingles(col("__text"))).as("sh"))
        .stat.bloomFilter("sh", expectedShingles, fpp)
      val bc = df.sparkSession.sparkContext.broadcast(filter)
      val hits = graft.functions.HashExpressions.bloomHitCount(shingles(text), bc)
      // null text -> null hits -> coalesce keeps the row (pass-through)
      df.filter(coalesce(hits < minHits, lit(true)))
    } else {
      val benchSet = bench.select(explode(shingles(col("__text"))).as("sh")).distinct()
      val hasText = col(Canonical.METADATA).isNotNull && text.isNotNull
      val doomed = df.filter(hasText)
        .select(col(Canonical.ID), explode(shingles(text)).as("sh"))
        .join(benchSet, "sh")
        .groupBy(Canonical.ID).agg(count(lit(1)).as("__hits"))
        .filter(col("__hits") >= minHits)
        .select(Canonical.ID)
      df.join(doomed, Seq(Canonical.ID), "left_anti")
    }
  }

  /** SEMANTIC decontamination as a declarative pipeline verb: drop
    * records whose VECTOR is within cosine `threshold` of any benchmark
    * embedding (`evalPath` parquet, `evalIdCol`/`evalVecCol`) — the
    * paraphrase-leakage gate the lexical step misses. Rides the fused
    * [[graft.functions.NearestEvalExpr]] argmax: a PURE MAP over the
    * stream, no join, no shuffle. NaN cosines (corrupt vectors) fail
    * CLOSED — dropped, never silently migrated. Records without a vector
    * pass through untouched. */
  def semanticDecontaminate(evalPath: String, threshold: Double = 0.8,
                            evalIdCol: String = "vec_id",
                            evalVecCol: String = "embedding"): DataFrame => DataFrame = { df =>
    val (ids, vecs) = Decontaminate.collectEvalSet(
      df.sparkSession.read.parquet(evalPath), evalIdCol, evalVecCol)
    // ONE pass (a union of complementary filters would scan the 100 TB
    // source twice): a null vector yields a null score — coalesce keeps
    // the row (pass-through) — while NaN < threshold is false — dropped,
    // fail closed
    df.withColumn("__best", graft.functions.VectorExpressions.nearestEval(
        col(Canonical.VECTOR), ids, vecs))
      .filter(coalesce(col("__best.max_cosine") < threshold, lit(true)))
      .drop("__best")
  }
}

case class CanonicalRecord(id: String, vector: Seq[Float], metadata: Map[String, String])
