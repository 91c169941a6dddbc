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

  test("split assigns every row exactly one stable label with ~right shares") {
    val out = Sampling.split(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() == docs.count())
    val shares = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / 500).toMap
    assert(math.abs(shares("train") - 0.8) < 0.08, shares.toString)
    assert(shares.keySet == Set("train", "val", "test"))
    // stable across partitionings
    val again = Sampling.split(docs.repartition(9), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = out.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
  }

  test("decontamination flags a planted duplicate eval doc") {
    import spark.implicits._
    val train = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val eval = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"), // fully contained
      (2L, "totally novel words never seen anywhere at all")).toDF("doc_id", "text")
    val out = Decontaminate.containment(train, eval).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((1.0, true)))
    assert(out(2L)._1 == 0.0 && !out(2L)._2)
  }

  test("short/empty eval docs stay in the containment report, never vanish") {
    import spark.implicits._
    val train = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (1L, "alpha beta gamma delta"),  // shingles fine
      (2L, "what is"),                 // 2 tokens < shingleSize: zero shingles
      (3L, ""),                        // empty
      (4L, null.asInstanceOf[String])) // null
      .toDF("doc_id", "text")
    def report(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3), r.getBoolean(4))).toMap
    for (face <- Seq(
        Decontaminate.containment(train, eval),
        Decontaminate.bloomContainment(train, eval))) {
      val out = report(face)
      // one row per eval doc — a consumer diffing ids against the report
      // must never read absence as "audited clean"
      assert(out.keySet == Set(1L, 2L, 3L, 4L), out.toString)
      for (id <- Seq(2L, 3L, 4L))
        assert(out(id) == ((0L, 0.0, false)), s"$id -> ${out(id)}")
      assert(out(1L)._2 == 1.0 && out(1L)._3) // planted containment intact
    }
  }

  test("null ids fail split assignment loudly instead of polluting one label") {
    import spark.implicits._
    val withNull = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b")).toDF("doc_id", "text")
    for (face <- Seq(
        () => Sampling.split(withNull, "doc_id", Seq("train" -> 0.9, "test" -> 0.1)),
        () => Sampling.splitPortable(withNull, "doc_id", Seq("train" -> 0.9, "test" -> 0.1)))) {
      val e = intercept[Exception] { face().collect() }
      assert(String.valueOf(e.getMessage).contains("null") ||
        Option(e.getCause).exists(c => String.valueOf(c.getMessage).contains("null")),
        e.toString)
    }
    // and clean frames are unaffected
    assert(Sampling.splitPortable(docs, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1)).count() == docs.count())
  }

  test("maskTokens masks at ~rate for STRING ids (no silent zero-mask)") {
    import spark.implicits._
    val strDocs = (1 to 300)
      .map(i => (s"crawl-$i-uuid", Seq.fill(20)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.maskTokens(strDocs, rate = 0.15)
    val masked = out.agg(org.apache.spark.sql.functions.sum("n_masked"))
      .collect()(0).getLong(0)
    val totalToks = 300L * 20L
    val frac = masked.toDouble / totalToks
    assert(math.abs(frac - 0.15) < 0.05, s"masked fraction $frac")
    // deterministic across partitionings
    val again = graft.ops.TextAnalysis.maskTokens(strDocs.repartition(7), rate = 0.15)
      .agg(org.apache.spark.sql.functions.sum("n_masked")).collect()(0).getLong(0)
    assert(again == masked)
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
