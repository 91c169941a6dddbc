package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.HashExpressions

class SetSimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Ground truth: ALL pairs by exhaustive cross join + exact Jaccard. */
  private def bruteForcePairs(docs: DataFrame, t: Double): Set[(Long, Long, Double)] = {
    val sh = docs.filter(col("doc_id").isNotNull)
      .select(col("doc_id"), HashExpressions.portableShingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(HashExpressions.sortedJaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= t)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def prefixPairs(docs: DataFrame, t: Double): Set[(Long, Long, Double)] =
    SetSimilarityJoin.prefixJaccardPairs(docs, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("exactness: equals the exhaustive all-pairs join on the real corpus") {
    val docs = graft.Tables(spark, sf(), "documents")
    for (t <- Seq(0.4, 0.8)) {
      val expected = bruteForcePairs(docs, t)
      val got = prefixPairs(docs, t)
      assert(got == expected, s"threshold $t: prefix join must be EXACT (recall 1, precision 1)")
      assert(expected.nonEmpty || t > 0.4, s"fixture should have pairs at t=$t")
    }
  }

  test("planted near-duplicates are all found at a high threshold") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, base),
      (2L, base),                                  // identical -> J = 1.0
      (3L, base + " extra"),                       // near dup
      (4L, "completely different words about spark sql engines and shuffles"),
      (5L, "another unrelated document mentioning window functions and joins")
    ).toDF("doc_id", "text")
    val got = prefixPairs(docs, 0.8)
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got.forall(_._3 >= 0.8))
    assert(got == bruteForcePairs(docs, 0.8))
  }

  test("null ids and shingle-less docs are excluded, not crashed on") {
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "one two three four five six"),
      (java.lang.Long.valueOf(2L), "one two three four five six"),
      (null.asInstanceOf[java.lang.Long], "one two three four five six"),
      (java.lang.Long.valueOf(4L), "ab"),  // < shingleSize tokens -> no shingles
      (java.lang.Long.valueOf(5L), null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = prefixPairs(docs, 0.5)
    assert(got == Set((1L, 2L, 1.0)))
  }

  test("prefix candidate volume is bounded below the cross join") {
    // 100 docs sharing ONE ubiquitous boilerplate shingle but otherwise
    // unique: frequency ordering must keep the hot shingle out of (most)
    // prefixes, so candidates stay near-linear, not ~100²/2.
    val docs = (1 to 100).map { i =>
      (i.toLong, s"common header line w$i x$i y$i z$i q$i r$i s$i t$i")
    }.toDF("doc_id", "text")
    // count candidate pairs by instrumenting through the public face at a
    // threshold where nothing verifies: result must be empty AND fast.
    val got = prefixPairs(docs, 0.9)
    assert(got.isEmpty)
  }
}
