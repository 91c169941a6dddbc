package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sequence packing for LM training: lay documents out as a contiguous
  * token stream and cut it into fixed-size training sequences
  * (concat-then-split, the standard pretraining layout — documents may
  * straddle a sequence boundary; the `spans_boundary` flag marks those).
  *
  * Scale design: one GLOBAL ordered window would pull every row through a
  * single task, so the stream is sharded first — each shard is an
  * independent token stream packed in parallel. The shard key is the
  * portable multiplicative hash ([[Sampling.portableBucket]]), so (a) the
  * layout is deterministic under any partitioning/scheduling, and (b) any
  * SQL engine reproduces it bit-for-bit (the DuckDB oracle replays the
  * same windows). Per-shard state is one running sum — O(1) memory per
  * window frame, no buffering of rows.
  *
  * The reference has no training-side ops at all (it stops at store-to-
  * store migration, `core/migrator.py`); this extends the engine toward
  * the dataset-preparation pipelines its collections feed.
  */
object Packing {

  /** Assign each document a (shard, seq_id, token_offset) in the packed
    * layout: `seq_id` is the training sequence its FIRST token lands in,
    * `token_offset` the position within that sequence. Documents longer
    * than `tokenBudget` still get a slot (they span multiple sequences).
    *
    * @param tokenBudget tokens per training sequence (e.g. 2048/4096/8192)
    * @param numShards   independent parallel streams; pick ≥ cluster
    *                    cores at 100 TB — packing quality is unaffected,
    *                    only sequence numbering locality
    */
  def concatSplitPack(docs: DataFrame, tokenBudget: Int, numShards: Int = 32,
                      idCol: String = "doc_id", textCol: String = "text",
                      tokenCount: Option[Column] = None): DataFrame = {
    require(tokenBudget > 0 && numShards > 0)
    val shard = pmod(Sampling.portableBucket(col(idCol)), lit(numShards.toLong))
    // explicit ROWS frame: the default RANGE frame treats rows with EQUAL
    // order keys as peers and sums them together, so duplicate doc ids
    // would both receive the same start offset and double-book their slot
    // — with ROWS each row gets its own running sum and the layout stays
    // non-overlapping even on non-deduped input. n_tokens is the SECONDARY
    // order key so the layout is deterministic on non-deduped input too:
    // same-id rows with different counts order by count, and same-id rows
    // with EQUAL counts are interchangeable (swapping them yields the
    // identical output rows), so the result is a deterministic multiset
    // under any partitioning/scheduling — and any SQL engine replays it
    // (the DuckDB oracle orders by the same two keys)
    val w = Window.partitionBy("shard").orderBy(col(idCol), col("n_tokens"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L))
    // null text packs as 0 tokens rather than poisoning the running sum
    // for every later doc in the shard (size(null) is -1 under Spark's
    // legacy sizeOfNull, hence the clamp, which also rejects negative
    // custom counts)
    val nTokens = greatest(lit(0L),
      coalesce(tokenCount.getOrElse(TextFunctions.tokenCount(col(textCol))).cast("long"),
        lit(0L)))
    docs
      .select(col(idCol), shard.as("shard"), nTokens.as("n_tokens"))
      .withColumn("start_tok", start)
      .select(
        col(idCol),
        col("shard"),
        col("n_tokens"),
        (col("start_tok") / tokenBudget).cast("long").as("seq_id"),
        pmod(col("start_tok"), lit(tokenBudget.toLong)).as("token_offset"),
        (pmod(col("start_tok"), lit(tokenBudget.toLong)) + col("n_tokens") >
          tokenBudget).as("spans_boundary"))
  }

  /** Per-(shard, sequence) fill statistics for the layout above — the
    * packing-efficiency audit (how many docs per sequence, how full the
    * last partial sequence is). One aggregate over the packed layout.
    *
    * COVERAGE CAVEAT: rows exist only for sequences where at least one
    * document STARTS (`seq_id` is the first-token sequence). A sequence
    * lying wholly inside one long spanning document has no starting doc
    * and therefore NO ROW here — by construction such sequences are 100%
    * filled (`n_docs_starting = 0`, `filled_to = tokenBudget`), so a
    * consumer averaging fill must treat the seq_id gaps within a shard as
    * full sequences, not missing data. */
  def packStats(packed: DataFrame, tokenBudget: Int): DataFrame =
    packed
      .groupBy("shard", "seq_id")
      .agg(
        count(lit(1)).as("n_docs_starting"),
        max(col("token_offset") + col("n_tokens")).as("last_end"))
      .select(
        col("shard"), col("seq_id"), col("n_docs_starting"),
        least(col("last_end"), lit(tokenBudget.toLong)).as("filled_to"))
}
