package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Keyword retrieval over the document corpus — the lexical complement to
  * the embedding ANN path (`ops/Similarity`). The reference engine's query
  * surface is vector-only; a training-data engine also needs term search
  * for targeted corpus auditing ("find every doc mentioning X").
  *
  * Scale shape: a posting-list plan, never a corpus-wide token shuffle.
  * The explode's query-term filter runs map-side, so only matching
  * (doc, term) rows — output-bound, |terms| · df rows — reach the
  * aggregate; term document-frequencies and the 1-row corpus stats are
  * broadcast back; the final ranking is a TakeOrdered(k), not a sort.
  */
object TextSearch {

  /** BM25 top-k over whitespace tokens (Robertson/Spärck Jones; the
    * `+1`-smoothed IDF Lucene uses, so scores are always positive).
    *
    * Determinism across engines: each (doc, term) weight is rounded to a
    * 1e-6-scaled long and the per-doc score is the exact integer sum, so
    * the result is independent of aggregation order — float addition is
    * not associative, and a plain `sum(double)` would hash-differ between
    * engines (and between partitionings) in the last ulp.
    *
    * @return (id, score, n_terms_matched), score-descending, id-ascending,
    *         top `k` rows.
    */
  def bm25Search(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Search needs at least one query term")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val toks = TextFunctions.tokens(lower(col(textCol)))
    // corpus stats: ONE cheap aggregate over the pruned (id, dl) scan,
    // broadcast as a 1-row frame (no collect)
    val stats = docs.select(size(toks).as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // posting rows: the isin filter drops non-query tokens map-side, so
    // the shuffle carries only |terms|·df rows however wide the corpus is
    val posting = docs
      .select(col(idCol), size(toks).as("dl"), explode(toks).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
    val dfreq = posting.groupBy("term").agg(count_distinct(col(idCol)).as("df"))
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val w = idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    posting
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), round(w * 1e6).cast("long").as("w6"))
      .groupBy(idCol)
      .agg((sum(col("w6")).cast("double") / 1e6).as("score"),
        count(lit(1)).as("n_terms_matched"))
      .select(col(idCol), round(col("score"), 6).as("score"), col("n_terms_matched"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
