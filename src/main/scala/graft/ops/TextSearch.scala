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
    // tokenize the QUERY with the same whitespace split as the corpus: a
    // multi-word term ("machine learning") can never equal a document
    // token, so it used to contribute silently nothing — now it means its
    // tokens, the standard bag-of-words reading
    val terms = queryTerms.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    require(terms.nonEmpty, "bm25Search query terms are all whitespace")
    // corpus fold MUST equal the query-term fold above (Locale.ROOT):
    // Spark's lower() delegates to the JVM default locale for non-ASCII,
    // so a tr/az/lt host would fold corpus tokens the ROOT-folded query
    // can never match
    val toks = TextFunctions.tokens(graft.functions.BpeExpressions.lowerRoot(col(textCol)))
    // ONE corpus scan: per doc, its length and the multiset of matching
    // query tokens (usually empty — the filter runs inside the scan
    // projection). Staged (Materialize = localCheckpoint, or reliable
    // checkpoint when configured) because three consumers need it — corpus
    // stats, term document-frequencies, and the score join; re-running the
    // lineage would re-tokenize the full text column per consumer, and at
    // scale the (id, int, tiny-array) sliver is orders of magnitude
    // narrower than the text it derives from.
    val base = Materialize(docs.select(col(idCol), size(toks).as("dl"),
      filter(toks, t => t.isin(terms: _*)).as("__mt")))
    // corpus stats broadcast as a 1-row frame (no collect)
    val stats = base.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // posting rows: only |terms|·df rows reach the shuffle
    val posting = base
      .select(col(idCol), col("dl"), explode(col("__mt")).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
    // plain count: posting is unique per (id, term) BY CONSTRUCTION (it is
    // a groupBy(id, term) output), so count(DISTINCT id) would only add an
    // expand + second shuffle stage for identical df values
    val dfreq = posting.groupBy("term").agg(count(lit(1)).as("df"))
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

  /** Hybrid lexical + vector retrieval via reciprocal-rank fusion
    * (Cormack et al. 2009): take the top `nCand` by BM25 and the top
    * `nCand` by cosine against `queryVec`, score each doc
    * Σ 1/(rrfK + rank) over the lists it appears in, return the fused
    * top `k`. RRF needs no score calibration between the two systems —
    * only ranks — which is what makes it the default fusion baseline.
    *
    * Scale shape: both candidate stages are TakeOrdered(nCand) (the
    * cosine side is one codegen'd kernel pass — swap in `Similarity`'s
    * LSH/IVF/PQ route when brute force stops being the right candidate
    * generator); the fusion then joins two nCand-row lists — driver-scale
    * inputs, executor-side execution. Determinism: ranks are exact ints,
    * 1/(rrfK+rank) is a single IEEE division, and a two-term double sum
    * is order-independent, so the fused scores are engine-portable.
    *
    * @return (id, rrf, rank_text, rank_vec) — rank 0 = absent from that
    *         candidate list (1-based otherwise; 0 keeps the column
    *         non-null for downstream schema stability).
    */
  def hybridTopK(docs: DataFrame, emb: DataFrame, queryTerms: Seq[String],
                 queryVec: Array[Double], k: Int = 10, nCand: Int = 50, rrfK: Int = 60,
                 idCol: String = "doc_id", textCol: String = "text",
                 embIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // both lists are <= nCand rows: the single-partition rank window is
    // driver-scale by construction, AFTER the distributed TakeOrdered
    val tRank = bm25Search(docs, queryTerms, k = nCand, idCol = idCol, textCol = textCol)
      .select(col(idCol).as("id"), col("score"))
      .withColumn("rank_text",
        row_number().over(Window.orderBy(col("score").desc, col("id"))))
    val vRank = emb
      .select(col(embIdCol).as("id"),
        round(graft.functions.VectorExpressions.cosine(col(vecCol), lit(queryVec)), 6)
          .as("vscore"))
      .orderBy(col("vscore").desc, col("id")).limit(nCand)
      .withColumn("rank_vec",
        row_number().over(Window.orderBy(col("vscore").desc, col("id"))))
    tRank.select(col("id"), col("rank_text"))
      .join(vRank.select(col("id"), col("rank_vec")), Seq("id"), "full_outer")
      .select(col("id"),
        round(coalesce(lit(1.0) / (lit(rrfK) + col("rank_text")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_vec")), lit(0.0)), 6).as("rrf"),
        coalesce(col("rank_text"), lit(0)).as("rank_text"),
        coalesce(col("rank_vec"), lit(0)).as("rank_vec"))
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
  }
}
