package graft.core

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Lifecycle of the persisted near-dedup signature index — the "dedup
  * today's crawl against history" workflow as a first-class pipeline step
  * and CLI verb (`--build-index` / `--ingest`).
  *
  * The index directory holds the three maintained artifacts of
  * [[Dedup.incrementalNearDupPairsIndexed]]:
  *   - `sigs/`   (id, minhash_sig)        — for candidate verification
  *   - `bands/`  (id, band, band_hash)    — for candidate generation
  *   - `widths/` (band, band_hash, bucket_n) — the skew-guard statistic
  *
  * `build` writes them once from a corpus; `ingest` checks a batch against
  * them (full-text work = signing the BATCH only), writes the novel
  * documents out, and appends the accepted batch's signatures/bands while
  * merging its width deltas — so the next ingest never recomputes
  * anything corpus-sized. At 100 TB of history the per-ingest corpus cost
  * is one broadcast-pruned scan of the narrow banded table.
  */
object SigIndex {

  case class Params(numHashes: Int = 64, numBands: Int = 16, shingleSize: Int = 3,
                    threshold: Double = 0.5, maxBucket: Int = 1000,
                    portable: Boolean = false,
                    idCol: String = "doc_id", textCol: String = "text")

  case class IngestReport(batchDocs: Long, duplicateDocs: Long, novelDocs: Long)

  /** Build the index from a corpus; returns the number of indexed docs
    * (docs with at least one shingle). */
  def build(spark: SparkSession, docs: DataFrame, indexDir: String, p: Params): Long = {
    Dedup.signatureTable(docs, p.idCol, p.textCol, p.numHashes, p.shingleSize, p.portable)
      .write.mode("overwrite").parquet(s"$indexDir/sigs")
    // band the PERSISTED sigs: one text scan total, banding is integer math
    val sigs = spark.read.parquet(s"$indexDir/sigs")
    Dedup.bandedSignatureTable(sigs, p.idCol, p.numBands, p.numHashes / p.numBands, p.portable)
      .write.mode("overwrite").parquet(s"$indexDir/bands")
    val bands = spark.read.parquet(s"$indexDir/bands")
    Dedup.bucketWidths(bands, p.idCol).write.mode("overwrite").parquet(s"$indexDir/widths")
    sigs.count()
  }

  /** Check `batch` against the index: novel docs (no near-duplicate in the
    * corpus at `threshold`) go to `novelOut` (if set) and — when `append`
    * — their signatures/bands join the index and the width table absorbs
    * their deltas. Duplicate batch docs are never indexed, so the corpus
    * stays deduplicated. */
  def ingest(spark: SparkSession, batch: DataFrame, indexDir: String, p: Params,
             novelOut: Option[String] = None, append: Boolean = true): IngestReport = {
    val sigs = spark.read.parquet(s"$indexDir/sigs")
    val bands = spark.read.parquet(s"$indexDir/bands")
    val widths = spark.read.parquet(s"$indexDir/widths")
    val pairs = Dedup.incrementalNearDupPairsIndexed(sigs, bands, widths, batch,
      p.idCol, p.textCol, p.numHashes, p.numBands, p.shingleSize,
      p.threshold, p.maxBucket, p.portable)
    val dupIds = pairs.select(col("batch_id").as(p.idCol)).distinct()
    val novel = batch.join(dupIds, Seq(p.idCol), "left_anti")
    novelOut.foreach(o => novel.write.mode("overwrite").parquet(o))
    val batchN = batch.count()
    val dupN = dupIds.count()
    if (append) {
      // batch-sized work only: sign + band the accepted docs, append both,
      // and merge their width deltas into the standing statistic.
      // MATERIALIZED first: `novel`'s lineage reads the index dirs, and an
      // append job must never list the directory it is writing into —
      // after Materialize each append writes from checkpointed data only.
      val novelSigs = graft.ops.Materialize(
        Dedup.signatureTable(novel, p.idCol, p.textCol, p.numHashes,
          p.shingleSize, p.portable))
      novelSigs.write.mode("append").parquet(s"$indexDir/sigs")
      val novelBands = graft.ops.Materialize(
        Dedup.bandedSignatureTable(novelSigs, p.idCol,
          p.numBands, p.numHashes / p.numBands, p.portable))
      novelBands.write.mode("append").parquet(s"$indexDir/bands")
      // widths/ is both input and output: land the merge beside it, then
      // swap atomically-enough via the filesystem rename
      val merged = Dedup.mergeBucketWidths(widths,
        Dedup.bucketWidths(novelBands, p.idCol))
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(indexDir), spark.sparkContext.hadoopConfiguration)
      val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/widths__next")
      val cur = new org.apache.hadoop.fs.Path(s"$indexDir/widths")
      merged.write.mode("overwrite").parquet(tmp.toString)
      fs.delete(cur, true)
      fs.rename(tmp, cur)
    }
    IngestReport(batchN, dupN, batchN - dupN)
  }

  // ------------------------------------------------------------- config

  /** JSON config for the CLI verbs:
    * {{{
    * {"documents": {"path": "/data/sf", "table_name": "documents",
    *                "id_column": "doc_id", "text_column": "text"},
    *  "index_dir": "/data/sig_index",
    *  "params": {"num_hashes": 64, "num_bands": 16, "shingle_size": 3,
    *             "threshold": 0.5, "max_bucket": 1000, "portable": false},
    *  "novel_output": "/data/novel"}
    * }}} */
  case class Config(docsPath: String, tableName: Option[String],
                    indexDir: String, params: Params, novelOutput: Option[String])

  def configFromFile(path: String): Config =
    configFromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))

  def configFromJson(text: String): Config = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(text)
    def str(n: JsonNode, k: String): Option[String] =
      Option(n.get(k)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
    val docs = Option(root.get("documents")).getOrElse(
      throw new graft.config.ConfigException("sig-index config needs a 'documents' block"))
    val pn = Option(root.get("params"))
    def num(k: String, dflt: Int): Int =
      pn.flatMap(p => Option(p.get(k))).map(_.asInt()).getOrElse(dflt)
    val p = Params(
      numHashes = num("num_hashes", 64),
      numBands = num("num_bands", 16),
      shingleSize = num("shingle_size", 3),
      threshold = pn.flatMap(x => Option(x.get("threshold"))).map(_.asDouble()).getOrElse(0.5),
      maxBucket = num("max_bucket", 1000),
      portable = pn.flatMap(x => Option(x.get("portable"))).exists(_.asBoolean()),
      idCol = str(docs, "id_column").getOrElse("doc_id"),
      textCol = str(docs, "text_column").getOrElse("text"))
    if (p.numHashes % p.numBands != 0)
      throw new graft.config.ConfigException(
        s"num_hashes (${p.numHashes}) must divide by num_bands (${p.numBands})")
    Config(
      docsPath = str(docs, "path").getOrElse(
        throw new graft.config.ConfigException("documents block needs a 'path'")),
      tableName = str(docs, "table_name"),
      indexDir = str(root, "index_dir").getOrElse(
        throw new graft.config.ConfigException("sig-index config needs 'index_dir'")),
      params = p,
      novelOutput = str(root, "novel_output"))
  }

  /** Resolve the config's document source to a DataFrame. */
  def readDocs(spark: SparkSession, cfg: Config): DataFrame = cfg.tableName match {
    case Some(t) => graft.Tables(spark, cfg.docsPath, t)
    case None => spark.read.parquet(cfg.docsPath)
  }
}
