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

  /** @param idCol    tie-break column for same-timestamp events (also the
    *                  deterministic ordering inside a session)
    * @param valueCol  per-event value summed into `session_value` — the
    *                  sum rides a 1e6-scaled LONG (exact integer addition,
    *                  order-independent) and is rounded to 2 dp at the
    *                  end: a plain double sum is not associative, so the
    *                  digit could flip between partitionings/engines at a
    *                  .005 boundary (the repo's portable-sum standard). */
  def sessions(events: DataFrame, gapMinutes: Int = 30,
               userCol: String = "user_id", tsCol: String = "ts",
               idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
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
        round(sum(round(col(valueCol).cast("double") * 1e6).cast("long")) / 1e6, 2)
          .as("session_value"),
        (max(unix_micros(col(tsCol))) - min(unix_micros(col(tsCol)))).as("duration_us"))
  }

  /** Per-session ORDERED event transcript — the assembly step that turns
    * an event/interaction log into sequence training data (conversation
    * turns, agent trajectories, clickstreams-as-text). The ordered list
    * is built with `sort_array(collect_list(struct(ts, id, type)))`: the
    * struct's (time, id) prefix gives a deterministic total order inside
    * ONE aggregation — no second window pass over pre-sorted partitions,
    * and partial aggregation still combines map-side. Session state is
    * bounded by session length, not partition size.
    *
    * @return (user, session_id, n_events, transcript) with
    *         `transcript` = event types joined by `sep` in time order.
    */
  def transcripts(events: DataFrame, gapMinutes: Int = 30,
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type", sep: String = " -> ",
                  idCol: String = "event_id"): DataFrame = {
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev_us", lag(col("__us"), 1).over(order))
      .withColumn("__new", when(
        col("__prev_us").isNull || col("__us") - col("__prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum("__new").over(order))
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        // coalesce: concat_ws SKIPS null elements, so a NULL event_type
        // silently shortened the transcript while n_events still counted
        // the event — a sequence consumer splitting by `sep` saw a length
        // that disagreed with n_events with no error
        concat_ws(sep, transform(
          sort_array(collect_list(struct(col("__us"), col(idCol),
            coalesce(col(typeCol), lit("(null)")).as(typeCol)))),
          x => x.getField(typeCol))).as("transcript"))
  }
}
