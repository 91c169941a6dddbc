package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch change-data-capture: classify every row of two snapshots of the
  * same keyed table as `insert` / `update` / `delete`, dropping the
  * unchanged majority. This is the general table-diff face of incremental
  * migration — [[graft.core.IncrementalMigrator]] is its vector-store
  * application (left-anti on a content hash); this operator keeps the full
  * three-way classification and per-column change counts, and its math is
  * portable (column-wise `IS DISTINCT FROM`, no engine-specific hash), so
  * a SQL oracle replays it exactly.
  *
  * The reference migrates by full re-copy only (`core/migrator.py:69-100`)
  * and names "incremental migration" as unfinished future work
  * (`README.md:286`); snapshot diffing is how that works at 100 TB — you
  * cannot re-ship the world nightly.
  *
  * Scale shape: ONE full-outer equi-join, each side shuffled once on the
  * key (zero shuffles if both snapshots are bucketed by the key — see
  * [[Bucketing]]); the old side is pruned to key + compared columns at the
  * scan. Comparison is per-column null-safe equality inside whole-stage
  * codegen — no row serialization, no JSON, no hash materialized.
  */
object SnapshotDiff {

  /** One row per changed key.
    *
    * @param compareCols columns whose change makes a row an `update`;
    *                    default = every shared non-key column.
    * @return key, `op` ('insert'|'update'|'delete'), the surviving value
    *         of each compared column (new side for insert/update, old side
    *         for delete), and `n_changed` (differing-column count; 0 for
    *         insert/delete). Unchanged keys are absent.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
           compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldSnap.columns.filter(c => c != idCol && newSnap.columns.contains(c)).toSeq
    require(cols.nonEmpty, s"no comparable columns besides '$idCol'")

    // presence is tracked with explicit side MARKERS, not id nullity: a
    // null-key row from the old side is unmatched in the full outer join
    // and id-nullity would classify it "insert" — re-shipping a stale
    // deleted row through upserts() instead of deleting it
    val o = oldSnap.select(lit(true).as("__in_old") +:
      (idCol +: cols).map(c => col(c).as(s"__o_$c")): _*)
    val n = newSnap.select(lit(true).as("__in_new") +:
      (idCol +: cols).map(c => col(c).as(s"__n_$c")): _*)
    val joined = o.join(n, col(s"__o_$idCol") === col(s"__n_$idCol"), "full_outer")

    val inOld = coalesce(col("__in_old"), lit(false))
    val inNew = coalesce(col("__in_new"), lit(false))
    def changed(c: String): Column = !(col(s"__o_$c") <=> col(s"__n_$c"))

    val anyChanged = cols.map(changed).reduce(_ || _)
    val nChanged = cols.map(c => changed(c).cast("int")).reduce(_ + _)

    joined
      .filter(!inOld || !inNew || anyChanged)
      .select(
        coalesce(col(s"__n_$idCol"), col(s"__o_$idCol")).as(idCol) +:
          when(!inOld, "insert").when(!inNew, "delete").otherwise("update").as("op") +:
          cols.map(c => when(inNew, col(s"__n_$c")).otherwise(col(s"__o_$c")).as(c)) :+
          when(inOld && inNew, nChanged).otherwise(0).as("n_changed"): _*)
  }

  /** The rows a sink must upsert: inserts + updates, carrying new-side
    * values (the write batch for [[graft.connectors.Connector]] sinks). */
  def upserts(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
              compareCols: Seq[String] = Nil): DataFrame =
    diff(oldSnap, newSnap, idCol, compareCols)
      .filter(col("op") =!= "delete").drop("op", "n_changed")

  /** The keys a sink must delete. */
  def deleteIds(oldSnap: DataFrame, newSnap: DataFrame, idCol: String): DataFrame =
    oldSnap.select(idCol).except(newSnap.select(idCol))

  /** Apply a computed diff to a vector-store collection: upserts ride the
    * DSv2 append path (per-partition batched, id-keyed replace), deletes
    * ship executor-side in id batches through the transport's
    * delete-by-id — so neither leg funnels rows through the driver. Both
    * legs are idempotent (upsert replaces, deleting an absent id is a
    * no-op), which makes RE-applying a diff after a partial failure safe —
    * the incremental-migration story the reference names as future work
    * (`README.md:286`) completed end to end.
    *
    * @param upserts    canonical `(id, vector, metadata)` rows to write
    * @param deleteIds  single-column ids to remove (any castable type)
    * @param connection endpoint options (`url`, `api_key`, `max_retries`) —
    *                   both legs resolve THIS endpoint's transport, so a
    *                   diff applies to the store it names even when other
    *                   endpoints are in play in the same plan
    */
  def applyTo(upserts: DataFrame, deleteIds: DataFrame, fmt: String, collection: String,
              deleteBatch: Int = 500,
              connection: Map[String, String] = Map.empty): Unit = {
    upserts.write.format(fmt).options(connection)
      .option("collection", collection).mode("append").save()
    val idCol = deleteIds.columns.head
    val spec = graft.connectors.vectorstore.TransportSpec
      .fromOptions(connection.get, backend = fmt.stripPrefix("graft-"))
    deleteIds.select(col(idCol).cast("string"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val store = graft.connectors.vectorstore.VectorStore.resolve(spec)
        it.map(_.getString(0)).grouped(deleteBatch).foreach { b =>
          store.delete(collection, b.toSeq)
        }
      }
  }
}
