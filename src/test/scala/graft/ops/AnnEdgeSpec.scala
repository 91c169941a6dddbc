package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-16 ANN edge hardening: string-id corpora must not silently empty
  * the ADC faces, shortlists must honor k, double-vector corpora must not
  * be rejected by the MMR encoder, and degenerate knobs fail loudly. */
class AnnEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int = 8, prefix: String = "") = {
    val rnd = new scala.util.Random(7)
    (0 until n).map(i => (s"$prefix$i", Seq.fill(dim)(rnd.nextFloat())))
  }

  test("PQ/IVF-PQ faces return results on STRING-id corpora (self-pair filter)") {
    // corpus ids are strings ("doc-3"), query ids long-castable — the old
    // self-pair filter coerced the string side to bigint (null) and the
    // three-valued filter silently dropped EVERY row
    val corpus = vecs(200, prefix = "doc-").toDF("vec_id", "embedding")
    val queries = vecs(3).toDF("vec_id", "embedding")
    val pq = Quantization.pqTopK(corpus, queries, k = 5, m = 4, ksub = 8)
    assert(pq.groupBy("query_id").count().collect().forall(_.getLong(1) == 5),
      "pqTopK returned short/empty results on a string-id corpus")
    val ivfpq = Quantization.ivfPqTopK(corpus, queries, k = 5,
      nCells = 4, nProbe = 4, m = 4, ksub = 8)
    assert(ivfpq.groupBy("query_id").count().collect().forall(_.getLong(1) == 5),
      "searchIvfPq returned short/empty results on a string-id corpus")
  }

  test("self-pair filter excludes the query's own point on double-id and zero-padded corpora") {
    // the r16 string-face compare still missed corpora whose id
    // STRINGIFIES differently from the long query id: a DoubleType id
    // renders "5.0" (≠ "5"), a zero-padded string id "05" — the query's
    // own point (distance 0) then took the top slot it never did on
    // long-id corpora
    val base = vecs(60)
    val queries = base.slice(5, 6).toDF("vec_id", "embedding") // id "5", vector in-corpus
    val corpusD = base.map { case (id, v) => (id.toDouble, v) }.toDF("vec_id", "embedding")
    val pqD = Quantization.pqTopK(corpusD, queries, k = 5, m = 4, ksub = 8)
    assert(!pqD.select(col("cand_id").cast("string")).as[String].collect().contains("5.0"),
      "double-id corpus: the query's own point occupied a top-k slot")
    assert(pqD.count() == 5, "filter over-excluded on a double-id corpus")
    val corpusZ = base.map { case (id, v) => (f"${id.toInt}%02d", v) }
      .toDF("vec_id", "embedding")
    val pqZ = Quantization.pqTopK(corpusZ, queries, k = 5, m = 4, ksub = 8)
    assert(!pqZ.select("cand_id").as[String].collect().contains("05"),
      "zero-padded corpus: the query's own point occupied a top-k slot")
    assert(pqZ.count() == 5, "filter over-excluded on a zero-padded corpus")
    val ivfD = Quantization.ivfPqTopK(corpusD, queries, k = 5,
      nCells = 4, nProbe = 4, m = 4, ksub = 8)
    assert(!ivfD.select(col("cand_id").cast("string")).as[String].collect().contains("5.0"),
      "IVF-PQ double-id corpus: the query's own point occupied a top-k slot")
  }

  test("ivfTopK works on string-id corpora (center ids are positions, not longs)") {
    val corpus = vecs(120, prefix = "u-").toDF("vec_id", "embedding")
    val queries = vecs(2, prefix = "q-").toDF("vec_id", "embedding")
    val r = Similarity.ivfTopK(corpus, queries, k = 4, nCells = 4, nProbe = 4)
    assert(r.groupBy("query_id").count().collect().forall(_.getLong(1) == 4))
    // degenerate knobs refuse instead of silently returning nothing
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(corpus, queries, k = 4, nCells = 4, nProbe = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(corpus, queries, k = 0, nCells = 4, nProbe = 2)
    }
  }

  test("mmrTopK shortlist path reads candidate vectors ONCE (no redundant join)") {
    val corpus = vecs(100).toDF("vec_id", "embedding")
    val queries = vecs(2).toDF("vec_id", "embedding")
    // materialize the tier so its own joins don't pollute the plan count
    val tier = Similarity.bruteForceTopK(corpus, queries, 20)
      .select(col("query_id").cast("long"), col("cand_id").cast("long"),
        col("score").cast("double"))
      .as[(Long, Long, Double)].collect().toSeq.toDF("query_id", "cand_id", "score")
    val df = Similarity.mmrTopK(corpus, queries, k = 5, nCand = 20,
      shortlist = Some(tier))
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    // membership -> candidate vectors, -> broadcast queries: exactly two.
    // the old plan joined candidates a SECOND time for c_vec that
    // rescoreMembership already had in hand
    assert(joins.size == 2, s"expected 2 joins, got ${joins.size}:\n" +
      df.queryExecution.optimizedPlan.treeString)
    // and with a tier covering the brute-force top-nCand the results are
    // IDENTICAL to the default path (the documented contract)
    val viaDefault = Similarity.mmrTopK(corpus, queries, k = 5, nCand = 20)
    assert(df.collect().toSet == viaDefault.collect().toSet)
  }

  test("hammingTopKReRank returns k rows even when shortlist < k") {
    val corpus = vecs(300).toDF("vec_id", "embedding")
    val queries = vecs(2).toDF("vec_id", "embedding")
    val r = Similarity.hammingTopKReRank(corpus, queries, k = 80, shortlist = 10)
    assert(r.groupBy("query_id").count().collect().forall(_.getLong(1) == 80),
      "a shortlist narrower than k silently short-changed the result")
  }

  test("mmrTopK accepts array<double> corpora (normalize() output)") {
    val corpus = vecs(100).toDF("vec_id", "embedding")
      .withColumn("embedding", VectorFunctionsBridge.normalize(col("embedding")))
    val queries = vecs(2).toDF("vec_id", "embedding")
      .withColumn("embedding", VectorFunctionsBridge.normalize(col("embedding")))
    val r = Similarity.mmrTopK(corpus, queries, k = 5, nCand = 20)
    assert(r.groupBy("query_id").count().collect().forall(_.getLong(1) == 5))
  }

  test("ADC query collection rejects null-vector queries loudly") {
    val corpus = vecs(50).toDF("vec_id", "embedding")
    val queries = Seq(("1", Seq(1f, 1f, 1f, 1f, 1f, 1f, 1f, 1f)),
      ("2", null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Quantization.pqTopK(corpus, queries, k = 3, m = 4, ksub = 8)
    }
    assert(e.getMessage.contains("embedding"), e.getMessage)
  }
}

/** `VectorFunctions.normalize` is the real face; a tiny bridge keeps the
  * spec honest about what users actually call. */
private object VectorFunctionsBridge {
  def normalize(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.normalize(c)
}

/** Margin mining: the hubness-normalization property the ratio margin
  * exists for, on a hand-verified 3D fixture. */
class MarginMiningSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("margin argmax rejects the hub a raw-cosine argmax would pick") {
    // src = the three axes; tgt: id 1 is a HUB (positive cosine to every
    // source), id 3 a specialist for src 0 (slightly LOWER raw cosine to
    // src 0 than the hub, negative to src 2), id 5 a specialist for
    // src 2. Hand-checked: for src 0 the raw-cosine argmax is the hub
    // (0.8436 vs 0.8170) but the margin argmax is the specialist
    // (1.3190 vs 1.1701) — the hub's own high kNN average normalizes it
    // down, which is the entire point of the criterion.
    val src = Seq((0L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f)), (4L, Seq(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(1f, 0.45f, 0.45f)), (3L, Seq(0.85f, -0.6f, 0f)),
      (5L, Seq(0.1f, 0.9f, 0.2f))).toDF("vec_id", "embedding")
    val mined = Similarity.marginTopPairs(src, tgt, k = 2)
      .orderBy("src_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(mined(0L)._1 == 3L,
      s"src 0 should mine the specialist (3), not the hub: ${mined(0L)}")
    assert(math.abs(mined(0L)._2 - 1.318975) < 1e-6, mined(0L).toString)
    assert(mined(2L)._1 == 5L && mined(4L)._1 == 1L, mined.toString)
    // the raw-cosine argmax for src 0 IS the hub — proving the two
    // criteria genuinely diverge on this fixture
    val rawTop = Similarity.bruteForceTopK(tgt, src.filter(col("vec_id") === 0L), k = 1)
      .head()
    assert(rawTop.getAs[Long]("cand_id") == 1L, rawTop.toString)
  }

  test("non-positive kNN-average denominators are excluded, never NaN or sign-inverted") {
    // src 0's every target is anti-correlated: both kNN averages are
    // negative, so the margin ratio is undefined-for-mining (dividing
    // would flip the argmax toward the LEAST similar candidate; a zero
    // denominator would crown a NaN). The guard drops such pairs — src 0
    // emits nothing — while the well-posed src 2 still mines.
    val src = Seq((0L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Seq(-1f, 0.4f)), (3L, Seq(-0.9f, 0.8f)))
      .toDF("vec_id", "embedding")
    val mined = Similarity.marginTopPairs(src, tgt, k = 2).collect()
    assert(!mined.exists(_.getLong(0) == 0L),
      s"undefined-margin source was mined: ${mined.toSeq}")
    val m2 = mined.filter(_.getLong(0) == 2L)
    assert(m2.length == 1 && !m2.head.getDouble(2).isNaN, mined.toSeq.toString)
  }
}
