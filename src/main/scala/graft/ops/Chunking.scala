package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking: split long documents into overlapping token windows
  * — the step that turns a raw corpus into the embedding-sized units a
  * vector store actually indexes. The reference migrates already-chunked
  * collections (`core/migrator.py:69-100` copies records as-is); this is
  * the upstream producer for that pipeline, and the unit boundary every
  * RAG/retrieval system needs to control (width = model context, stride <
  * width = overlap so answers straddling a boundary survive).
  *
  * Windows start at 0, stride, 2*stride, ... ; the last window may be
  * shorter than `width` but never empty; a document with no tokens yields
  * no chunks. `ceil((n-width)/stride) + 1` chunks per doc — all integer
  * math, so a SQL oracle replays boundaries exactly.
  *
  * Scale shape: embarrassingly parallel — one projection + one explode,
  * no shuffle at all; output size is `n/stride * width` tokens (the
  * overlap tax is explicit and tunable). Chunk rows carry (doc, idx) so
  * downstream embedding/loading needs no join back to the corpus.
  */
object Chunking {

  /** One row per chunk: (idCol, chunk_idx, n_tokens, chunk_text), plus
    * every column of `docs` except the text (metadata rides along). */
  def chunkByTokens(docs: DataFrame, width: Int, stride: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      "need width > 0 and 0 < stride <= width")
    // loud on collision, not silent overwrite: the doc promise is that
    // every caller column rides along — a frame already carrying these
    // names (e.g. re-chunking an exported chunk table) would have its
    // metadata silently replaced by the new indexes
    val reserved = Seq("chunk_idx", "n_tokens", "chunk_text", "__toks")
    val clash = reserved.filter(docs.columns.contains)
    require(clash.isEmpty,
      s"chunkByTokens writes ${clash.mkString(", ")} but the input already " +
        "carries such column(s) — rename them first (they would be " +
        "silently overwritten)")
    // ONE tokenization definition across Chunking/TextSearch/Bpe — the
    // shared helper carries the null/empty guard since round 13
    val toks = graft.functions.TextFunctions.tokens(col(textCol))
    val n = size(col("__toks"))
    // Tables.spread (r19): tokenize + window explode fuse into the scan —
    // single-core on a single-file input otherwise; no-op on multi-file
    val spreadDocs = graft.Tables.spread(docs)
    // ceil((n - width)/stride) + 1 via integer math (n > width); else 1
    val nChunks = when(n <= width, lit(1))
      .otherwise(((n - width + stride - 1) / stride).cast("int") + 1)

    val sliced: Column = slice(col("__toks"), col("chunk_idx") * stride + 1, lit(width))
    spreadDocs
      .withColumn("__toks", toks)
      .filter(size(col("__toks")) > 0)
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .withColumn("n_tokens", size(sliced))
      .withColumn("chunk_text", array_join(sliced, " "))
      .drop("__toks", textCol)
  }

  /** Mean-pool per-chunk embeddings back to one document vector — the
    * standard way a RAG corpus gets its doc-level representation (index
    * chunks for retrieval, pool them for doc-level dedup/clustering).
    *
    * One posexplode + one hash aggregation on (doc, dimension): partial
    * aggs combine map-side, the shuffle carries |docs|·dim skinny rows —
    * no window, no per-doc state. Output is one row per (doc, dimension)
    * with the pooled component on the 1e-6 grid: inputs snap to integer
    * micro-units (`round(v·1e6)` — exact for already-6-rounded inputs),
    * the mean is an exact integer sum divided once, and the final
    * `floor(x + 0.5)` re-snap is the same signed-zero-free grid move as
    * [[graft.ops.Pca.covariancePortable]] — so a SQL oracle reproduces
    * every component bit-for-bit. `pooled_v = pooled6 / 1e6` (exact IEEE
    * division by a power-of-ten scale on grid integers ≤ 2^31). */
  def meanPoolEmbeddings(chunks: DataFrame, docIdCol: String = "doc_id",
                         vecCol: String = "embedding"): DataFrame =
    chunks
      .select(col(docIdCol), posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy(col(docIdCol), col("i"))
      // count(v), not count(*): sum() skips null components, so counting
      // their rows would silently dilute the mean toward zero on arrays
      // with containsNull — numerator and denominator must agree
      .agg(floor(sum(round(col("v").cast("double") * 1e6)) / count(col("v")) + 0.5)
        .cast("long").as("pooled6"))
      .select(col(docIdCol), (col("i") + 1).as("pos"), col("pooled6"),
        (col("pooled6") / 1e6).as("pooled_v"))
}
