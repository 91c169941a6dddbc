package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Conversion-funnel analysis over an events table: for an ordered list of
  * stages (e.g. signup → click → purchase), each user's stage-k timestamp
  * is the earliest stage-k event AFTER their stage-(k-1) timestamp; the
  * furthest stage reached is the funnel depth.
  *
  * Shape: one aggregate per stage joined back on user — k small (funnel
  * lengths are single digits), each round a hash aggregate + broadcast-able
  * join on user_id. No window over the whole stream, no per-user
  * collect — the plan a 10M-events-per-user-shard cluster runs unchanged.
  */
object Funnel {

  /** @return user_id, stage_1_us..stage_k_us (null where never reached),
    *         and `funnel_depth` (0..k). */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty)
    val base = events.select(col(userCol), col(typeCol),
      unix_micros(col(tsCol)).as("__us"))
    var acc: DataFrame = base.select(col(userCol)).distinct()
    stages.zipWithIndex.foreach { case (stage, i) =>
      val prev = if (i == 0) lit(Long.MinValue) else col(s"stage_${i}_us")
      val hits = base.filter(col(typeCol) === stage)
        .join(acc.select((userCol +: (1 to i).map(j => s"stage_${j}_us")).map(col): _*), userCol)
        .filter(col("__us") > prev)
        .groupBy(userCol)
        .agg(min("__us").as(s"stage_${i + 1}_us"))
        .select(col(userCol), col(s"stage_${i + 1}_us"))
      acc = acc.join(hits, Seq(userCol), "left_outer")
    }
    val depth = stages.indices.map(i =>
      when(col(s"stage_${i + 1}_us").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("funnel_depth", depth)
  }
}
