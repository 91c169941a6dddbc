package graft

import org.apache.spark.sql.functions._
import graft.ops.SkewJoin

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL functions are injected via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "round(vec_cosine(array(3.0D, 4.0D), array(4.0D, 3.0D)), 6) AS c, " +
        "vec_l2(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS l").head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 0.96)
    assert(r.getDouble(2) == 5.0)
  }

  test("word_shingle_hashes + simhash64 compose in SQL") {
    val r = spark.sql(
      "SELECT simhash64(word_shingle_hashes('the quick brown fox jumps', 2)) AS fp," +
        " size(word_shingle_hashes('the quick brown fox jumps', 2)) AS n").head()
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) == 4)
  }

  test("hashed_bow_embed and space_saving_topk are SQL-callable") {
    val e = spark.sql(
      "SELECT hashed_bow_embed('a b a', 4) AS v").head().getSeq[Double](0)
    assert(e.length == 4 && math.abs(e.map(x => x * x).sum - 1.0) < 1e-12)
    val hh = spark.sql(
      "SELECT space_saving_topk(x, 4) AS hh FROM " +
        "(SELECT explode(array('a','a','b','a')) AS x)").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(hh.head.getString(0) == "a" && hh.head.getLong(1) == 3L)
    assert(hh(1).getString(0) == "b" && hh(1).getLong(1) == 1L)
  }

  test("url_canonicalize is SQL-callable") {
    val c = spark.sql(
      "SELECT url_canonicalize('HTTP://Ex.COM:80/p?b=2&utm_source=x&a=1#f') AS c")
      .head().getString(0)
    assert(c == "http://ex.com/p?a=1&b=2", c)
  }

  test("SQL vec_cosine equals the Scala API on real embeddings") {
    Tables(spark, sf(), "embeddings").createOrReplaceTempView("emb_ext")
    val viaSql = spark.sql(
      """SELECT a.vec_id, round(vec_cosine(a.embedding, b.embedding), 6) AS c
        |FROM emb_ext a JOIN emb_ext b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id LIMIT 5""".stripMargin)
      .as[(Long, Double)].collect().toSeq
    val e = Tables(spark, sf(), "embeddings")
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("vb"))
    val viaApi = a.join(b, col("idb") === col("ida") + 1)
      .select(col("ida"),
        round(graft.functions.VectorFunctions.cosineSimilarity(col("va"), col("vb")), 6))
      .orderBy("ida").limit(5).as[(Long, Double)].collect().toSeq
    assert(viaSql == viaApi)
  }
}

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join under heavy skew") {
    // 10k rows, 90% on one hot key
    val left = (1 to 10000).map(i => (if (i <= 9000) 1L else i.toLong % 50, s"v$i"))
      .toDF("k", "payload")
    val right = (0L to 60L).map(k => (k, s"dim$k")).toDF("rk", "attr")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "payload", "attr").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk", saltFactor = 8)
      .select("k", "payload", "attr").collect().map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin refuses right-preserving join types (replication would duplicate)") {
    import spark.implicits._
    val left = Seq((1L, "x")).toDF("k", "payload")
    val right = Seq((2L, "orphan")).toDF("rk", "attr")
    // a full outer would emit the unmatched right row once PER SALT
    for (jt <- Seq("full_outer", "right_outer", "full", "right"))
      assert(intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(left, right, "k", "rk", saltFactor = 8, joinType = jt)
      }.getMessage.contains("replicated"), jt)
    // left-preserving types stay available
    val lo = SkewJoin.saltedJoin(left, right, "k", "rk", joinType = "left_outer")
    assert(lo.count() == 1)
  }

  test("map-typed left columns (canonical metadata) don't break the salt") {
    // xxhash64 over a MapType throws AnalysisException; the salt must skip
    // map columns rather than refuse canonical frames outright
    val left = (1 to 200)
      .map(i => (if (i <= 150) 1L else i.toLong % 10, s"v$i", Map("m" -> s"$i")))
      .toDF("k", "payload", "metadata")
    val right = (0L to 10L).map(k => (k, s"dim$k")).toDF("rk", "attr")
    val plain = left.join(right, col("k") === col("rk"))
      .select("k", "payload", "attr").collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk", saltFactor = 4)
      .select("k", "payload", "attr").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq && salted.nonEmpty)
    // the hot key really spreads: distinct salts on the payload-bearing rows
    val spread = SkewJoin.saltedJoin(left, right, "k", "rk", saltFactor = 4)
    assert(spread.count() == plain.length)
  }

  test("saltCols override: explicit tiebreak column, unknown name refused") {
    val left = (1 to 100).map(i => (1L, i)).toDF("k", "tiebreak")
    val right = Seq((1L, "hot")).toDF("rk", "attr")
    val out = SkewJoin.saltedJoin(left, right, "k", "rk", saltFactor = 8,
      saltCols = Seq("tiebreak"))
    assert(out.count() == 100)
    val e = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(left, right, "k", "rk", saltCols = Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
    // an all-map frame can't derive a salt and must say so
    val allMap = Seq(Map("a" -> "b")).toDF("metadata")
    val e2 = intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(allMap, right, "metadata", "rk")
    }
    assert(e2.getMessage.contains("hash-safe"), e2.getMessage)
  }
}
