package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.BpeExpressions

/** Distributed byte-pair-encoding tokenizer (Sennrich, Haddow & Birch,
  * ACL 2016): train subword merges on the corpus, then encode documents
  * into subword tokens — the tokenizer-training prep step of an LM data
  * pipeline ([[TextAnalysis.vocabulary]] gives whole words; this gives the
  * open-vocabulary subwords actually fed to the model).
  *
  * Scale shape: training NEVER iterates over the corpus. The corpus is
  * scanned ONCE into the (word, freq) table — Heaps' law makes that table
  * orders of magnitude smaller than 100 TB of text — and every merge round
  * runs on that small, materialized relation: one explode of adjacent
  * symbol pairs, one map-side-combined sum, one driver argmax (a bounded
  * 1-row collect), one symbol rewrite. Encoding is one corpus map with the
  * learned merges riding along as a reference object
  * ([[graft.functions.BpeEncodeExpr]]).
  */
object Bpe {

  /** The end-of-word marker appended to each word's symbol sequence, so a
    * merged subword that ends a word is distinct from the same subword
    * mid-word (and detokenization is unambiguous). */
  val EndOfWord: String = "</w>"

  /** Learned merge list; rank = position. */
  case class BpeModel(merges: Seq[(String, String)])

  /** (word, freq) over lowercased whitespace tokens — the one corpus scan.
    * Lowercasing is [[BpeExpressions.lowerRoot]] (Locale.ROOT), the exact
    * fold the encode kernel applies — Spark's `lower()` uses the JVM
    * default locale for non-ASCII and would train merges the encoder can
    * never reproduce on a tr/az/lt host. */
  def wordFrequencies(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(graft.functions.TextFunctions.tokens(
        BpeExpressions.lowerRoot(col(textCol)))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Adjacent-symbol-pair statistics over the word-frequency table — the
    * statistic each merge round maximizes, exposed as a relation (and the
    * SQL-oracle face of the trainer: `q_bpe_pairs`). Pairs are rendered
    * `"a b"`; symbols never contain whitespace (words are
    * whitespace-split), so the rendering is injective. */
  def pairStats(docs: DataFrame, topK: Int = 50, textCol: String = "text"): DataFrame =
    adjacentPairs(
      wordFrequencies(docs, textCol)
        .select(col("freq"), BpeExpressions.charSymbols(col("w")).as("syms")))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(topK)

  /** (pair, cnt) from a (freq, syms) relation. Fully-merged words (one
    * symbol left) contribute nothing — Spark's `sequence(1, 0)` would run
    * DESCENDING, so the empty case is explicit. */
  private def adjacentPairs(wordSyms: DataFrame): DataFrame =
    wordSyms
      .select(col("freq"), explode(
        when(size(col("syms")) >= 2,
          transform(sequence(lit(1), size(col("syms")) - 1),
            i => concat(element_at(col("syms"), i), lit(" "), element_at(col("syms"), i + 1))))
          .otherwise(array().cast("array<string>")))
        .as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))

  /** Merge one pair occurrence-by-occurrence, leftmost-first — shared by
    * the trainer (via UDF over the word table) and the encode kernel. */
  private[graft] def mergeOnce(syms: IndexedSeq[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Train `numMerges` merges. Deterministic: ties on count break to the
    * lexicographically smallest pair. Each round touches only the
    * materialized word table; `minFreq` stops early when the best pair
    * drops below it. */
  def train(docs: DataFrame, numMerges: Int = 100, minFreq: Long = 2,
            textCol: String = "text"): BpeModel = {
    val spark = docs.sparkSession
    val mergeUdf = udf((syms: Seq[String], a: String, b: String) =>
      mergeOnce(syms.toIndexedSeq, a, b))
    // the ONE corpus pass; everything after runs on the vocab table
    var words = Materialize(
      wordFrequencies(docs, textCol)
        .select(col("freq"), BpeExpressions.charSymbols(col("w")).as("syms")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val top = adjacentPairs(words)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(1) < minFreq) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((a, b))
        // rewrite only words that can contain the pair (both symbols
        // present) — the common case leaves most of the table untouched
        val hasPair = array_contains(col("syms"), a) && array_contains(col("syms"), b)
        words = Materialize(words.select(col("freq"),
          when(hasPair, mergeUdf(col("syms"), lit(a), lit(b)))
            .otherwise(col("syms")).as("syms")))
      }
      round += 1
    }
    BpeModel(merges.toSeq)
  }

  /** Persist a trained model: merges as (rank, left, right) parquet — the
    * tokenizer is an ARTIFACT you ship with the corpus it was trained on,
    * like the IVF-PQ index ([[Quantization.saveIvfPqIndex]]); rank
    * preserves the merge-application order, which IS the model. */
  def save(spark: org.apache.spark.sql.SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a persisted model; encode with the reloaded merges is
    * bit-identical to encoding with the freshly-trained ones (spec). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): BpeModel = {
    import spark.implicits._
    BpeModel(spark.read.parquet(path)
      .select("rank", "left", "right").as[(Int, String, String)]
      .collect().sortBy(_._1).map(t => (t._2, t._3)).toSeq)
  }

  /** Encode text into subword tokens with a trained model — one corpus
    * map, merges as a reference object. */
  def encode(docs: DataFrame, model: BpeModel, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      BpeExpressions.bpeEncode(col(textCol), model.merges.toArray).as("subwords"))
      .withColumn("n_subwords", size(col("subwords")))

  /** Reassemble text from subwords (spec face: encode must round-trip). */
  def detokenize(subwords: Seq[String]): String =
    subwords.mkString("").replace(EndOfWord, " ").trim
}

/** Bridge for [[graft.functions.BpeEncodeExpr]] (functions can't see ops'
  * private members; the merge loop must be THE SAME code in train and
  * encode). */
object BpeMerge {
  def apply(syms: IndexedSeq[String], a: String, b: String): Vector[String] =
    Bpe.mergeOnce(syms, a, b)
}
