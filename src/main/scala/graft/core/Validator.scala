package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Canonical

/** Post-migration validation: compare a source and target collection and
  * produce a small per-check report — the "did the copy actually arrive
  * intact" step the reference leaves entirely to the user (its migrator
  * returns a bare bool, `core/migrator.py:108-111`, and its README shows
  * hand-run psql/scroll spot checks, `README.md:235-253`).
  *
  * All checks ride ONE pass: each side is collapsed to one row per id
  * (count + a portable vector signature), the two are full-outer-joined
  * on id — the same single-shuffle-per-side shape as
  * [[graft.ops.SnapshotDiff]] — and every check is an aggregate over that
  * join. Nothing is collected; the report is a handful of rows.
  *
  * The vector signature is the portable polynomial fold over
  * `round(x * 2^20)`-scaled components (float->double is exact, the
  * scaling is the repo's standard lossless-integer trick), so a SQL
  * engine reproduces it bit-for-bit and the value-mismatch check is
  * oracle-checkable end to end.
  */
object Validator {

  /** Mod-P polynomial signature of a float vector; NULL vector -> -1
    * (distinguishes "no vector" from any real signature). */
  def vectorSignature(vec: Column): Column = {
    val folded = aggregate(
      vec,
      lit(0L),
      (acc, x) => pmod(acc * 131L +
        pmod(round(x.cast("double") * (1L << 20)).cast("long"), lit(2147483647L)),
        lit(2147483647L)))
    when(vec.isNull, -1L).otherwise(folded)
  }

  /** One row per check: (check, value, passed).
    *
    * Count checks (`rows_*`, `distinct_ids_*`) are informational
    * (`passed` = true); integrity checks pass iff their value is 0:
    * `ids_missing_in_target`, `ids_extra_in_target`, `dup_ids_source`,
    * `dup_ids_target`, `vector_mismatches` (same id, different signature
    * — covers dim changes, value changes, dropped/added vectors).
    *
    * `appendMode`: the documented contract for validating a run that
    * APPENDED onto prior target contents (`recreate: false`) — ids
    * present only in the target are then the legitimate prior
    * collection, not a defect, so `ids_extra_in_target` is reported
    * with its count but `passed` = true (informational). Every check
    * that inspects the ids the run DID ship (missing, dups, vector
    * mismatches) keeps its strict gate in both modes. */
  def validate(source: DataFrame, target: DataFrame,
               idCol: String = Canonical.ID,
               vecCol: String = Canonical.VECTOR,
               appendMode: Boolean = false): DataFrame = {
    def perId(df: DataFrame, side: String) = df
      .select(col(idCol).as("__id"), vectorSignature(col(vecCol)).as("__sig"))
      .groupBy("__id")
      .agg(count(lit(1)).as(s"__n_$side"), min("__sig").as(s"__sig_$side"),
        countDistinct("__sig").as(s"__nsig_$side"))

    val s = perId(source, "s")
    val t = perId(target, "t")
    val j = s.withColumnRenamed("__id", "__id_s")
      .join(t.withColumnRenamed("__id", "__id_t"),
        col("__id_s") === col("__id_t"), "full_outer")

    val agg = j.agg(
      sum(coalesce(col("__n_s"), lit(0L))).as("rows_source"),
      sum(coalesce(col("__n_t"), lit(0L))).as("rows_target"),
      count(col("__id_s")).as("distinct_ids_source"),
      count(col("__id_t")).as("distinct_ids_target"),
      sum(when(col("__id_t").isNull, 1L).otherwise(0L)).as("ids_missing_in_target"),
      sum(when(col("__id_s").isNull, 1L).otherwise(0L)).as("ids_extra_in_target"),
      sum(when(col("__n_s") > 1, 1L).otherwise(0L)).as("dup_ids_source"),
      sum(when(col("__n_t") > 1, 1L).otherwise(0L)).as("dup_ids_target"),
      // null-SAFE signature compare (<=>): a corrupted vector whose
      // ELEMENT decodes to null folds the signature itself to null, and
      // `=!=` would evaluate to NULL -> counted 0 -> corruption reads as
      // "validation passed". With <=> a null-vs-real signature is a
      // mismatch; both-null (same corruption both sides) stays equal.
      sum(when(col("__id_s").isNotNull && col("__id_t").isNotNull &&
        (!(col("__sig_s") <=> col("__sig_t")) || col("__nsig_s") > 1 || col("__nsig_t") > 1),
        1L).otherwise(0L)).as("vector_mismatches"))

    val informational = Set("rows_source", "rows_target",
      "distinct_ids_source", "distinct_ids_target") ++
      (if (appendMode) Set("ids_extra_in_target") else Set.empty)
    // na.fill: an agg over an EMPTY join (a transform/pipeline that
    // filtered everything) returns NULL sums — the report must carry 0s,
    // not nulls that NPE the caller's getLong
    val checks = agg.na.fill(0L).columns.map { c =>
      struct(lit(c).as("check"), col(c).as("value"),
        (if (informational(c)) lit(true) else col(c) === 0L).as("passed"))
    }
    agg.na.fill(0L).select(explode(array(checks: _*)).as("r")).select("r.*")
  }

  /** Validate a FINISHED migration: re-derive the expected target from the
    * config (source read + the same transform) and compare it to what the
    * target collection actually holds. A `recreate: true` run replaced
    * the collection, so extras are defects (strict); a `recreate: false`
    * run appended onto prior contents, so `ids_extra_in_target` is
    * reported informationally ([[validate]]'s `appendMode`) instead of
    * flunking every legitimate append. */
  def validateMigration(spark: org.apache.spark.sql.SparkSession,
                        config: graft.config.MigrationConfig,
                        transform: Option[DataFrame => DataFrame] = None): DataFrame = {
    import graft.connectors.ConnectorRegistry
    val query = config.source.query.getOrElse(
      throw new graft.config.ConfigException("source block needs a 'query' section"))
    val load = config.target.load.getOrElse(
      throw new graft.config.ConfigException("target block needs a 'load' section"))
    val src = ConnectorRegistry(config.source.kind)
      .read(spark, config.source.connection, query)
    // EXPECTED must be derived exactly like Migrator.run derives what it
    // writes: the config's declarative pipeline FIRST, then the
    // programmatic/--transform hook. Skipping the pipeline here made
    // --validate fail every pipelined migration (expected = the raw
    // source) — or, worse, compare against the wrong baseline.
    val effective = TransformPipeline.effective(config.pipeline, transform)
    val expected = effective.map(_(src)).getOrElse(src)
    // readBack, not a default-column read: a pgvector target written
    // under renamed id/vector columns would otherwise fail the read
    // (column not found) and report a successful migration as failed
    val actual = ConnectorRegistry(config.target.kind)
      .readBack(spark, config.target.connection, load)
    validate(expected, actual, appendMode = !load.recreate)
  }
}
