package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (batch form).
  *
  * A new session starts when the gap to the previous event of the same user
  * exceeds `gapMinutes`. One shuffle (partition by user) + two window passes;
  * the streaming twin with `flatMapGroupsWithState` lives in
  * [[graft.streaming.StreamOps]].
  */
object Sessionize {

  def sessions(events: DataFrame, gapMinutes: Int = 30,
               userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val withId = events
      .withColumn("__prev_us", lag(unix_micros(col(tsCol)), 1).over(order))
      .withColumn("__new", when(
        col("__prev_us").isNull ||
          unix_micros(col(tsCol)) - col("__prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("__new").over(order))
    withId
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("session_value"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol)))).as("duration_us"))
  }
}
