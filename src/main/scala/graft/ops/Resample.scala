package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed per-key grid with forward fill — the gap-filling step before any
  * windowed feature computation, join against regular series, or
  * sequence-model training on sensor/metric data. (The calendar-spine
  * idiom `q_recursive_cte` builds globally, made per-key and
  * value-carrying.)
  *
  * Buckets are fixed-width epoch windows (`floor(epoch_us / width)`) —
  * integer-portable like [[Cohorts]]. Per (key, bucket) the LAST
  * observation wins, ordered by (ts, event id) so ties are deterministic;
  * missing buckets between a key's first and last observation are
  * emitted with the carried-forward value and `observed = false`.
  *
  * Scale shape: one row_number window bounded by bucket population, one
  * per-key spine explode (span/width rows), one forward-fill window whose
  * running state is O(1). Everything shuffles on the key; no collect.
  */
object Resample {

  def forwardFill(events: DataFrame, bucketMicros: Long,
                  keyCol: String = "user_id", tsCol: String = "ts",
                  valueCol: String = "value", idCol: String = "event_id"): DataFrame = {
    require(bucketMicros > 0, "bucketMicros > 0")
    val keyed = events
      // a NULL value is a non-observation, not an observation of null:
      // without this filter a null-valued event arriving LAST in a bucket
      // won the row_number and silently erased an earlier real reading in
      // the same bucket (carrying the previous bucket forward instead)
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__b", floor(col("__us") / bucketMicros))
    val lastWins = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("__us").desc, col(idCol).desc)
    val perBucket = keyed
      .withColumn("__rn", row_number().over(lastWins))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("__b"), col(valueCol).as("__v"))

    val spine = perBucket.groupBy(keyCol)
      .agg(min("__b").as("__b0"), max("__b").as("__b1"))
      .select(col(keyCol), explode(sequence(col("__b0"), col("__b1"))).as("__b"))

    val fill = Window.partitionBy(keyCol).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perBucket, Seq(keyCol, "__b"), "left_outer")
      .select(col(keyCol),
        (col("__b") * bucketMicros).as("bucket_start_us"),
        last(col("__v"), ignoreNulls = true).over(fill).as(valueCol),
        col("__v").isNotNull.as("observed"))
  }
}
