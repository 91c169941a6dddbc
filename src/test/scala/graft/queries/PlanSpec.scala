package graft.queries

import graft.{SparkSpec, SparkEntry, Bench}

/** Plan-shape assertions: the properties that decide 100 TB viability,
  * enforced so a regression in pushdown/broadcast/codegen fails CI, not the
  * cluster. */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    (SparkEntry.queries ++ Bench.benchOnly)(q)(spark, sf())
      .queryExecution.executedPlan.toString

  test("q_scan_filter pushes predicates into the parquet scan") {
    val p = plan("q_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(lang), EqualTo(lang,en), GreaterThan(n_chars,200)]")
      || p.contains("EqualTo(lang,en)"), p)
  }

  test("q_scan_project prunes to the two requested columns") {
    val p = plan("q_scan_project")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,label:int>"), p)
  }

  /** r19: join strategy now comes from MEASURED sizes (AQE), not estimates
    * — the static plan keeps only the explicitly hinted dim broadcasts and
    * resolves the fact-side joins at runtime. The 100 TB invariants: the
    * hinted dims broadcast, nothing goes cartesian, and after execution no
    * join is left sort-merge at gate scale (AQE promoted every one from
    * actual shuffle statistics). */
  test("q_join_pricing: hinted dims broadcast; runtime sizes pick the fact joins") {
    val df = (SparkEntry.queries ++ Bench.benchOnly)("q_join_pricing")(spark, sf())
    val initial = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(initial).length >= 2,
      s"hinted nation/region broadcasts missing:\n$initial")
    assert(!initial.contains("CartesianProduct"), initial)
    // collect(), not count(): count() wraps the Dataset in a NEW agg plan
    // with its own QueryExecution, leaving THIS df's AQE un-finalized
    df.collect()
    // AdaptiveSparkPlan.toString appends the "== Initial Plan ==" section
    // after the final plan — assert on the final section only
    val fin = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(fin.contains("isFinalPlan=true"), fin)
    assert(!fin.contains("SortMergeJoin"),
      "AQE left a sort-merge join at gate scale:\n" + fin)
  }

  /** The r19 regression this config exists to prevent: the planner used to
    * broadcast the LINEITEM FACT TABLE into q3_shipping off a bad
    * post-projection size estimate (measured ~4 s of driver hash build at
    * sf1; an OOM at 100 TB). No BroadcastExchange may have the fact scan
    * in its subtree — in the initial or the executed plan. */
  test("q3_shipping never driver-broadcasts the lineitem fact table") {
    val df = (SparkEntry.queries ++ Bench.benchOnly)("q3_shipping")(spark, sf())
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // formatted mode lists each operator's Input columns right under its
    // header: a BroadcastExchange whose input carries lineitem columns is
    // exactly the estimate-driven fact broadcast this config removed
    val factBcast = """\(\d+\) BroadcastExchange\s*\nInput \[\d+\]: \[l_""".r
    assert(factBcast.findFirstIn(formatted).isEmpty,
      "lineitem landed on a static BroadcastExchange:\n" + formatted)
  }

  test("q1_agg uses two-phase (partial then final) hash aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), p) // map-side combine before the shuffle
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q_ann_topk broadcasts the query side") {
    val p = plan("q_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("minhash signature is a compiled expression, not interpreted HOFs") {
    val p = plan("q_dedup_minhash")
    assert(p.contains("minhash_signature") || p.contains("word_shingle_hashes"), p)
    assert(!p.contains("aggregate(word_shingle"), p)
  }

  test("hamming search over a binary collection pushes a native search scan") {
    val p = plan("q_connector_search_hamming")
    assert(p.contains("search=topk") && p.contains("metric=hamming"), p)
  }

  test("count(*) over a vector-store scan is pushed into the scan") {
    val p = plan("q_connector_count")
    assert(p.contains("agg=count(*)"), p)
  }

  test("q_mix_token_budget scans documents at most twice, cutoffs broadcast back") {
    val p = plan("q_mix_token_budget")
    assert("FileScan parquet".r.findAllIn(p).length <= 2, p)
    assert(p.contains("BroadcastHashJoin"), "cutoff table not broadcast:\n" + p)
  }

  test("q_ann_diverse adds no scan or shuffle beyond the top-k it diversifies") {
    val d = plan("q_ann_diverse")
    val t = plan("q_ann_topk")
    assert("FileScan parquet".r.findAllIn(d).length ==
      "FileScan parquet".r.findAllIn(t).length, d)
    // group-cap window rides the same query_id exchange as the rank window
    assert("Exchange hashpartitioning".r.findAllIn(d).length <=
      "Exchange hashpartitioning".r.findAllIn(t).length + 1, d)
  }

  test("limit queries use CollectLimit / TakeOrderedAndProject, not full sorts") {
    assert(plan("q_sort_topk").contains("TakeOrderedAndProject"), plan("q_sort_topk"))
  }

  test("as-of join runs as one window pass, no join operator at all") {
    val p = plan("q_asof_join")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("range join is an equi-join on time bins") {
    val p = plan("q_range_join")
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"), p)
  }

  test("vec_sum centroid aggregates partially before the shuffle") {
    val p = plan("q_vec_centroid_agg")
    assert(p.contains("partial_vec_sum") || p.contains("partial_vecsumagg")
      || p.toLowerCase.contains("partial_vec"), p)
  }

  test("q_chunk_pool is one corpus scan with partial aggregation, no join") {
    val p = plan("q_chunk_pool")
    assert("FileScan parquet".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_sum") || p.contains("partial_count"), p) // map-side combine
  }

  test("q_corpus_datacard is one scan + one partial-combined aggregation") {
    val p = plan("q_corpus_datacard")
    assert("FileScan parquet".r.findAllIn(p).length == 1, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(p.contains("partial_sum"), p)
  }

  test("q_ann_hard_negatives broadcasts queries and positive floors, no shuffle joins") {
    val p = plan("q_ann_hard_negatives")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_text_extract stays embarrassingly parallel: no exchange at all") {
    val p = plan("q_text_extract")
    assert(!p.contains("Exchange"), p)
  }

  test("indexed incremental dedup: corpus pruned by broadcast, never re-aggregated") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf(), "documents")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("plan_sig").toString
    val n = graft.core.SigIndex.build(spark, corpus, dir,
      graft.core.SigIndex.Params(numHashes = 16, numBands = 4, portable = true))
    assert(n > 0)
    val p = graft.core.SigIndex.Params(numHashes = 16, numBands = 4, portable = true)
    val indexed = graft.ops.Dedup.incrementalNearDupPairsIndexed(
      spark.read.parquet(s"$dir/sigs"), spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/widths"), batch,
      numHashes = 16, numBands = 4, portable = true)
      .queryExecution.executedPlan.toString
    val legacy = graft.ops.Dedup.incrementalNearDupPairs(
      spark.read.parquet(s"$dir/sigs"), batch,
      numHashes = 16, numBands = 4, portable = true)
      .queryExecution.executedPlan.toString
    // the touched-bucket prune arrives via broadcast...
    assert("BroadcastHashJoin".r.findAllIn(indexed).length >= 2, indexed)
    // ...every join in the indexed path — including the verify join against
    // the full corpus signature table — builds on a broadcast of the
    // batch-proportional side: no sort-merge join means no Exchange ever
    // lands on a corpus-sized input (the 100 TB invariant)
    assert(!indexed.contains("SortMergeJoin"),
      "corpus-side join fell back to sort-merge:\n" + indexed)
    // ...and the per-ingest corpus-side aggregation (bucket recount) is
    // gone: only the candidate distinct remains, so strictly fewer
    // aggregates than the derive-on-the-fly path
    val aggs = (s: String) => "HashAggregate".r.findAllIn(s).length
    assert(aggs(indexed) < aggs(legacy),
      s"indexed=${aggs(indexed)} legacy=${aggs(legacy)}")
  }

  test("margin mining: keyed joins only — never an unbroadcast cartesian product") {
    // the kNN passes ride the broadcast pattern (queries small) and the
    // margin stage joins the top-k lists on their OWN keys; a
    // CartesianProduct (the non-broadcast cross join Spark falls back to
    // when a join has no usable condition) anywhere in this plan would
    // be the 100 TB scale-killer
    val p = plan("q_ann_margin_mine")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("leakage-safe split: the corpus joins the component labels, nothing quadratic") {
    val p = plan("q_split_leakage_safe")
    assert(!p.contains("CartesianProduct"), p)
    // the split assignment is a row-local CASE over the representative's
    // portable bucket — no aggregation happens above the label join
    assert(p.contains("pmod") || p.contains("CASE WHEN"), p)
  }

  test("semantic decontamination is a PURE MAP: no join, no exchange, no agg") {
    // the fused NearestEvalExpr replaced crossJoin(broadcast) + groupBy;
    // at 100 TB that is the difference between zero shuffle and an
    // O(train-rows) one
    val p = plan("q_decontaminate_semantic")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("HashAggregate"), p)
    assert(p.contains("nearest_eval"), p)
  }

  test("q_mm_ahash_neardup: banded join, never a cartesian/nested-loop product") {
    val p = plan("q_mm_ahash_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_mm_ahash_neardup_guarded: the bucket-size filter joins, never a cartesian") {
    // the guard adds a count aggregate + semi-shaped join on the band key;
    // the candidate join must stay an equi-join on (band, band_bits)
    val p = plan("q_mm_ahash_neardup_guarded")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}