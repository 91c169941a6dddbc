package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInWindow equals the naive inequality join") {
    val ev = Tables(spark, sf(), "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("ts").as("s_ts"))
    val binned = RangeJoin.pointInWindow(clicks, signups, "ts", "s_ts", 10)
      .select("c_id", "s_id").as[(Long, Long)].collect().toSet
    val naive = clicks.join(signups,
        unix_micros(col("ts")) >= unix_micros(col("s_ts")) &&
          unix_micros(col("ts")) < unix_micros(col("s_ts")) + 600000000L)
      .select("c_id", "s_id").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
  }

  test("the binned plan is an equi-join, not a nested loop") {
    val ev = Tables(spark, sf(), "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("s_id"), col("ts").as("s_ts"))
    val plan = RangeJoin.pointInWindow(clicks, signups, "ts", "s_ts", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}

class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf(), "documents")

  test("hashSample is deterministic and invariant under repartitioning") {
    val a = Sampling.hashSample(docs, "doc_id", 0.3).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.3).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("hashSample rate lands near the requested fraction") {
    val n = docs.count().toDouble
    val kept = Sampling.hashSample(docs, "doc_id", 0.5).count().toDouble
    assert(math.abs(kept / n - 0.5) < 0.1, s"rate ${kept / n}")
  }

  test("stratified drops unlisted strata and biases listed ones") {
    val out = Sampling.stratified(docs, "lang",
      Map("en" -> 1.0, "de" -> 0.0), idCol = "doc_id")
    val langs = out.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs == Set("en")) // de sampled at 0, others unlisted -> dropped
    assert(out.count() == docs.filter(org.apache.spark.sql.functions.col("lang") === "en").count())
  }
}

class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    Bucketing.writeBucketed(
      Tables(spark, sf(), "lineitem").select("l_orderkey", "l_quantity"),
      "li_bkt", "l_orderkey", 4)
    Bucketing.writeBucketed(
      Tables(spark, sf(), "orders").select("o_orderkey", "o_totalprice"),
      "o_bkt", "o_orderkey", 4)
    val joined = Bucketing.table(spark, "li_bkt")
      .join(Bucketing.table(spark, "o_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    // disable broadcast so the bucket layout is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 0, s"expected shuffle-free bucketed join:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }
}
