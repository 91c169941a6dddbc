package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Driver-contract invariants: catches silent breakage of the gate wiring
  * (shadowed names, orphan oracles) before the round does. */
class ContractSpec extends AnyFunSuite {

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("no query name collides across family maps (++ would shadow silently)") {
    val families = Seq(
      "relational" -> RelationalQueries.queries.keySet,
      "vector" -> VectorQueries.queries.keySet,
      "pipeline" -> PipelineQueries.queries.keySet,
      "connector" -> ConnectorQueries.queries.keySet,
      "advanced" -> AdvancedQueries.queries.keySet)
    val merged = families.map(_._2.size).sum
    assert(merged == SparkEntry.queries.size,
      families.combinations(2).flatMap { case Seq((an, a), (bn, b)) =>
        val inter = a intersect b
        if (inter.nonEmpty) Some(s"$an ∩ $bn = $inter") else None
      }.mkString("; "))
  }

  test("bench headline names all resolve (gated or bench-only)") {
    val missing = Bench.headline.filterNot((SparkEntry.queries ++ Bench.benchOnly).contains)
    assert(missing.isEmpty, s"headline without query: $missing")
  }

  test("gate size matches the documented inventory") {
    // round 7: +q_connector_milvus_wire, +q_connector_pinecone_wire,
    // +q_ann_mmr_tiered, +q_dsir_weights, +q_ann_hard_negatives,
    // +q_chunk_pool, +q_dedup_incremental, +q_text_extract,
    // +q_catalog_update, +q_catalog_merge, +q_corpus_datacard
    // round 11: +q_connector_cursor_sliced_pinecone, +q_decontaminate_semantic,
    // +q_decontaminate_semantic_lsh
    // round 13: +q_dedup_cosine_lsh_ms (the multi-seed recall default),
    // +q_mm_ahash_neardup_guarded (the skew-guard path, oracle-replayed
    // at a bucket bound the sf0.01 corpus genuinely exceeds)
    // round 15: +q_connector_search_filtered (metadata filter absorbed
    // into the pushed search — the canonical filtered vector query),
    // +q_connector_search_filtered_hamming (its binary face)
    // round 16: +q_connector_search_aliased (withColumn-then-filter
    // top-k shape, require()-pinned to rewrite), +q_dedup_incremental_stream
    // (the streaming dedup face hash-checked against the batch oracle)
    // round 17: +q_dedup_near_stream (streaming SimHash near-dedup,
    // fingerprint-set oracle = DISTINCT-wrapped q_dedup_simhash),
    // +q_decontaminate_semantic_stream (streaming ≡ batch, same oracle),
    // +q_migrate_pgwire (config-driven migration into a LIVE PostgreSQL
    // over the v3 wire client; memory-connector fallback where no server
    // can run — same canonical rows, same oracle)
    // round 18 (post-snapshot): +q_ann_margin_mine_ivf (the 100 TB margin
    // mining composition — marginFromNeighbors over ivfTopK lists — with
    // the full IVF tier replayed in the oracle; the count bump was missed
    // in that commit and caught by this spec in r19's inherited-state check)
    assert(SparkEntry.queries.size == 183, SparkEntry.queries.size.toString)
  }

  test("EVERY gated query is oracle-adjudicated (no rows-only gates)") {
    // round 6 invariant: rows-only queries live in Bench.benchOnly, never
    // in the gated map — a gated query without an oracle is a perpetual
    // `err` row on the driver scoreboard
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"gated queries without oracle: $rowsOnly")
  }
}
