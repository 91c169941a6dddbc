package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's single data currency: the canonical vector record
  * `{id, vector, metadata}` — the shape every reference adapter produces
  * and consumes (`core/adapter.py:33-55`, constructed e.g. at
  * `adapters/pgvector.py:118-126`).
  *
  * Spark mapping (SURVEY §1.5): id is a lossless `string` union of the
  * reference's int-or-str ids; vector is `array<float>`; metadata is
  * `map<string,string>` (matching pgvector's TEXT degradation,
  * `adapters/pgvector.py:182`). A typed metadata projection is available
  * via [[CanonicalDF.withTypedMetadata]] when a backend schema is known.
  */
object Canonical {
  val ID = "id"
  val VECTOR = "vector"
  val METADATA = "metadata"

  // The table's id is NON-nullable: a stored record always has one (the
  // store is id-keyed), and SQL row-level operations (UPDATE/MERGE) require
  // a non-nullable row id. Null-id INPUTS are only accepted through the
  // connector facade (Backends.write coalesces null ids to "" before the
  // V2 write, then the writer applies each backend's rule — Milvus skips
  // them, adapters/milvus.py:187-193; others reject). Direct SQL
  // INSERT INTO / DataFrameWriterV2 with a nullable id column is rejected
  // by Spark's table-output resolution before any writer runs.
  val schema: StructType = StructType(Seq(
    StructField(ID, StringType, nullable = false),
    StructField(VECTOR, ArrayType(FloatType, containsNull = false), nullable = true),
    StructField(METADATA, MapType(StringType, StringType, valueContainsNull = true), nullable = true)))

  /** BINARY_VECTOR collections (Milvus accepts either float or binary as
    * the vector field, `adapters/milvus.py:82`): same record shape, the
    * vector column is packed bits (`binary`, dim/8 bytes — see
    * [[graft.functions.BinaryVectors]] for the bit layout). */
  val binarySchema: StructType = StructType(Seq(
    StructField(ID, StringType, nullable = false),
    StructField(VECTOR, BinaryType, nullable = true),
    StructField(METADATA, MapType(StringType, StringType, valueContainsNull = true), nullable = true)))

  /** Project an arbitrary DataFrame into canonical shape.
    *
    * @param idCol          source id column
    * @param vectorCol      source vector column (array of numeric), optional
    *                       — Milvus collections may have no vector field
    *                       (`adapters/milvus.py:119`)
    * @param metadataCols   columns folded into the metadata map as strings
    */
  def from(df: DataFrame, idCol: String, vectorCol: Option[String],
           metadataCols: Seq[String]): DataFrame = {
    val vec: Column = vectorCol match {
      case Some(v) => transform(col(v), _.cast("float")).as(VECTOR)
      case None => lit(null).cast(ArrayType(FloatType, containsNull = false)).as(VECTOR)
    }
    val meta: Column =
      if (metadataCols.nonEmpty) map_from_arrays(
        array(metadataCols.map(lit): _*),
        array(metadataCols.map(c => col(c).cast("string")): _*)).as(METADATA)
      else if (df.columns.contains(METADATA) &&
          df.schema(METADATA).dataType.isInstanceOf[MapType])
        // an ALREADY-CANONICAL metadata map (a round trip through a
        // canonical export — parquet/csv/json of our own write path)
        // passes through instead of being silently EMPTIED: the
        // incremental migrator's content hash reads the target back this
        // way, and a dropped map re-classified every row as changed
        col(METADATA).cast(MapType(StringType, StringType)).as(METADATA)
      else map().cast(MapType(StringType, StringType)).as(METADATA)
    df.select(col(idCol).cast("string").as(ID), vec, meta)
  }

  /** Digit-string ids → long, like the Qdrant sink's coercion
    * (`adapters/qdrant.py:220-222`); non-digit ids stay strings (callers
    * pick the column matching their backend's id type). */
  def coercedIdColumns(df: DataFrame): DataFrame =
    df.withColumn("id_long",
      when(col(ID).rlike("^[0-9]+$"), col(ID).cast("long")).otherwise(lit(null).cast("long")))

  /** Vector dimension of the first non-null vector — the reference's
    * first-row dim inference (`adapters/pgvector.py:167`). Engine code
    * prefers declared dims; this exists for compat. */
  def inferDim(df: DataFrame): Option[Int] =
    df.select(size(col(VECTOR)).as("d")).filter(col("d") > 0).limit(1)
      .collect().headOption.map(_.getInt(0))

  /** Typed metadata projection: lift map entries back to columns using a
    * target schema (the Milvus load path needs typed scalars,
    * `adapters/milvus.py:223-233`). Missing keys → null (None-fill rule,
    * `adapters/milvus.py:218-222`). */
  def withTypedMetadata(df: DataFrame, fields: Seq[(String, DataType)]): DataFrame =
    fields.foldLeft(df) { case (d, (name, dt)) =>
      d.withColumn(name, element_at(col(METADATA), name).cast(dt))
    }
}
