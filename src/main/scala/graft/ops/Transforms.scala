package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.model.Canonical

/** The user-transform surface (reference T1, `core/migrator.py:79-87`):
  * declared column transforms for the common cases, plus a row-map escape
  * hatch for arbitrary per-record logic — the two tiers SURVEY §2 calls
  * for. Transforms compose with `andThen` and plug into
  * [[graft.core.Migrator.run]].
  */
object Transforms {

  /** The reference's example transform (`examples/add_source_tracking.py:
    * 12-47`): stamp provenance into metadata. `timestamp` is an explicit
    * argument — a deterministic pipeline beats `datetime.now()` inside the
    * transform. */
  def addSourceTracking(sourceDb: String, timestamp: String): DataFrame => DataFrame =
    df => df.withColumn(Canonical.METADATA,
      map_concat(col(Canonical.METADATA),
        map(lit("source_db"), lit(sourceDb),
          lit("migration_timestamp"), lit(timestamp))))

  /** Keep only records whose metadata key matches a predicate expression
    * (the drop-items use documented in `README.md:160-192`). */
  def filterByMetadata(sqlPredicate: String): DataFrame => DataFrame =
    df => df.filter(expr(sqlPredicate))

  /** Rename a metadata key (no-op when absent). */
  def renameMetadataKey(from: String, to: String): DataFrame => DataFrame =
    df => df.withColumn(Canonical.METADATA, {
      val without = map_filter(col(Canonical.METADATA), (k, _) => k =!= from)
      when(map_contains_key(col(Canonical.METADATA), from),
        map_concat(without, map(lit(to), element_at(col(Canonical.METADATA), from))))
        .otherwise(col(Canonical.METADATA))
    })

  /** L2-normalize the vector column (modify-vectors use). */
  def normalizeVectors: DataFrame => DataFrame =
    df => df.withColumn(Canonical.VECTOR,
      transform(graft.functions.VectorFunctions.normalize(col(Canonical.VECTOR)),
        _.cast("float")))

  /** Row-map escape hatch: arbitrary per-record logic over the canonical
    * shape, distributed via mapPartitions — the full generality of the
    * reference's `transform(data) -> data` hook without materializing on
    * the driver. */
  def rowMap(f: CanonicalRecord => Option[CanonicalRecord]): DataFrame => DataFrame = { df =>
    val spark = df.sparkSession
    import spark.implicits._
    df.as[CanonicalRecord].mapPartitions(_.flatMap(r => f(r))).toDF()
  }
}

case class CanonicalRecord(id: String, vector: Seq[Float], metadata: Map[String, String])
