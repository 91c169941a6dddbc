package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Canonical

/** Loadable migration transform (`--transform graft.examples.DedupVectors`):
  * drop records whose vector is byte-identical to an earlier record's,
  * keeping the lowest id — "migrate and dedup" in one pass. Hash-partition
  * on the vector itself; duplicate groups are naturally small, so the
  * per-key window state is bounded. The reference has no dedup at all —
  * this is the engine's training-data machinery surfaced through its CLI.
  */
class DedupVectors extends (DataFrame => DataFrame) {
  override def apply(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(Canonical.VECTOR)).orderBy(col(Canonical.ID))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}

/** Loadable migration transform (`--transform graft.examples.SemanticDedup`):
  * drop NEAR-duplicate records (cosine >= 0.995) during migration, blocked
  * by k-means clusters (the SemDeDup recipe — [[graft.ops.Dedup
  * .semanticNearDupPairs]]). Greedy keep-lowest-id: any record named as the
  * larger id of a near-dup pair is dropped — type-agnostic over the
  * canonical string ids, no component propagation needed for the
  * near-exact-copy regime this threshold targets. Recall caveat inherent
  * to cluster blocking: a near-dup pair whose members BOTH become seeds
  * lands in two clusters and is missed — real corpora run k ≪ n where
  * that is vanishingly rare (exercised deliberately in the spec). */
class SemanticDedup extends (DataFrame => DataFrame) {
  override def apply(df: DataFrame): DataFrame =
    graft.ops.Dedup.semanticDedupPipeline(
      df, idCol = Canonical.ID, vecCol = Canonical.VECTOR,
      threshold = 0.995, nClusters = 16, iters = 2)
}
