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
