package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Document-level text analysis: stats, quality, language-ID, fingerprints.
  * Thin compositions of [[graft.functions.TextFunctions]] — all codegen'd
  * column expressions, embarrassingly parallel at any scale. */
object TextAnalysis {

  /** Per-document token/char statistics. */
  def documentStats(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"),
      TextFunctions.subwordCount(col(textCol)).as("n_subwords"),
      length(col(textCol)).as("n_chars_actual"),
      round(TextFunctions.punctRatio(col(textCol)), 6).as("punct_ratio"),
      round(TextFunctions.stopwordRatio(col(textCol)), 6).as("stopword_ratio"),
      round(TextFunctions.meanTokenLength(col(textCol)), 6).as("mean_tok_len"))

  /** Quality scoring + keep/drop verdict at `minScore`. */
  def qualityFilter(docs: DataFrame, minScore: Double,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      TextFunctions.qualityScore(col(textCol)).as("quality"),
      (TextFunctions.qualityScore(col(textCol)) >= minScore).as("keep"))

  /** Marker-word language identification. */
  def languageId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), TextFunctions.langId(col(textCol)).as("lang_pred"))

  /** Content + order-sensitive fingerprints. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol),
      md5(col(textCol)).as("content_md5"),
      TextFunctions.fingerprint(col(textCol)).as("content_xxh64"),
      TextFunctions.rollingHash(col(textCol)).as("rolling_hash"))
}
