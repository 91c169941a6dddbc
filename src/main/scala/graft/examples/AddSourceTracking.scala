package graft.examples

import org.apache.spark.sql.DataFrame

/** Loadable example transform for the CLI (`--transform
  * graft.examples.AddSourceTracking`) — the JVM twin of the reference's
  * `examples/add_source_tracking.py`, which stamps `source_db` and
  * `migration_timestamp` into every record's metadata
  * (`examples/add_source_tracking.py:32-39`). The timestamp here is the
  * job-submission time captured once on the driver, so every record in a
  * run gets the same stamp (the reference calls `datetime.now()` mid-loop).
  */
class AddSourceTracking extends (DataFrame => DataFrame) {
  override def apply(df: DataFrame): DataFrame =
    graft.ops.Transforms.addSourceTracking(
      sourceDb = "pgvector",
      timestamp = java.time.Instant.ofEpochMilli(
        df.sparkSession.sparkContext.startTime).toString)(df)
}
