package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Interpreted-vs-codegen PARITY for every custom expression that carries
  * BOTH an `eval` twin and a `doGenCode` twin as hand-written logic.
  *
  * Why this exists: the oracle gates run with codegen ON, so they
  * adjudicate only the GENERATED Java against DuckDB — the interpreted
  * `nullSafeEval` twin runs when codegen is disabled, when an expression
  * lands in a non-codegen context (e.g. inside certain aggregate frames),
  * or when the generated method splits past JIT limits and Spark falls
  * back per-row. A divergence between the twins is invisible to the gates
  * until one of those contexts flips — this spec forces each mode
  * explicitly (`spark.sql.codegen.factoryMode` NO_CODEGEN vs CODEGEN_ONLY
  * with wholeStage toggled) and requires byte-identical collected output.
  *
  * CodegenFallback-only expressions (shingles, minhash, BPE) have one
  * body by construction — nothing to compare; they are exercised by
  * CodegenStrictSpec and the gates. */
class CodegenParitySpec extends SparkSpec {
  import spark.implicits._

  private def inMode[A](mode: String)(body: => A): A = {
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val prevWs = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.factoryMode", mode)
    spark.conf.set("spark.sql.codegen.wholeStage",
      (mode == "CODEGEN_ONLY").toString)
    try body
    finally {
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
      spark.conf.set("spark.sql.codegen.wholeStage", prevWs)
    }
  }

  /** Collect `df` in both modes; the rows must match exactly (toString
    * rendering covers nested arrays/structs deterministically since the
    * frame carries an explicit orderBy upstream). */
  private def assertParity(mk: => DataFrame): Unit = {
    val interpreted = inMode("NO_CODEGEN")(mk.collect().map(_.toString).toSeq)
    val codegen = inMode("CODEGEN_ONLY")(mk.collect().map(_.toString).toSeq)
    assert(interpreted.nonEmpty, "parity input collapsed to zero rows")
    assert(interpreted == codegen,
      s"interpreted vs codegen diverged:\n  i=${interpreted.take(3)}\n  c=${codegen.take(3)}")
  }

  // deterministic corpus: text with unicode, empties, repeats; vectors
  // with zeros, negatives, non-finite-free floats; ids for ordering
  private lazy val docs = Seq(
    (0L, "the quick brown Fox jumps OVER the lazy dog"),
    (1L, "Straße İstanbul ĄĘĆ unicode Mixed CASE"),
    (2L, ""),
    (3L, "a"),
    (4L, "repeat repeat repeat repeat repeat repeat repeat"),
    (5L, "punctuation, lots; of! it? (yes) [really] {braces} <angle>"),
    (6L, "the the the and and of of to to in in"),
    (7L, "7 numbers 42 mixed 3.14 with 0 words"))
    .toDF("id", "text").orderBy("id")

  private lazy val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, -1.0f, 2.0f), Seq(0.5f, -0.5f, 1.5f, -1.5f)),
    (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f, 1.0f)),
    (2L, Seq(-3.25f, 4.5f, 0.125f, -0.0625f), Seq(2.0f, -2.0f, 0.25f, 8.0f)),
    (3L, Seq(1e-7f, 1e7f, -1e-7f, -1e7f), Seq(1e7f, 1e-7f, 1f, -1f)))
    .toDF("id", "a", "b").orderBy("id")

  test("parity: portableTokenHashes / portableStringFold / polyFoldHash") {
    assertParity(docs.select($"id",
      HashExpressions.portableTokenHashes($"text").as("th"),
      HashExpressions.portableStringFold($"text").as("sf"),
      HashExpressions.polyFoldHash(
        HashExpressions.portableTokenHashes($"text")).as("pf")))
  }

  test("parity: rollingWindowHashes over token hashes") {
    assertParity(docs.select($"id",
      HashExpressions.rollingWindowHashes(
        HashExpressions.portableTokenHashes($"text"), 3, 2).as("rw"),
      HashExpressions.rollingWindowHashes(
        HashExpressions.portableTokenHashes($"text"), 2, 1).as("rw2")))
  }

  test("parity: sortedJaccard / signatureMatchFraction") {
    assertParity(docs.as("l").crossJoin(docs.as("r"))
      .select($"l.id", $"r.id",
        HashExpressions.sortedJaccard(
          array_sort(HashExpressions.portableTokenHashes($"l.text")),
          array_sort(HashExpressions.portableTokenHashes($"r.text"))).as("j"))
      .orderBy($"l.id", $"r.id"))
  }

  test("parity: bloom hit kernels") {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq("the", "quick", "brown").foreach(w => bf.putLong(PortableStringFold.fold(w)))
    val bc = spark.sparkContext.broadcast(bf)
    assertParity(docs.select($"id",
      HashExpressions.bloomHitCount(
        HashExpressions.portableTokenHashes($"text"), bc).as("hits"),
      HashExpressions.bloomMightContain(
        HashExpressions.portableStringFold($"text"), bc).as("mc")))
  }

  test("parity: minhash signature + simhash64") {
    val rnd = new scala.util.Random(42)
    val as = Array.fill(16)(math.abs(rnd.nextLong()) % HashExpressions.P + 1)
    val bs = Array.fill(16)(math.abs(rnd.nextLong()) % HashExpressions.P)
    assertParity(docs.select($"id",
      HashExpressions.minHashSignature(
        HashExpressions.portableTokenHashes($"text"), as, bs).as("sig"),
      HashExpressions.simHash64(
        HashExpressions.portableTokenHashes($"text")).as("fp")))
  }

  test("parity: vector kernels dot/cosine/l2 + int8 quantize") {
    assertParity(vecs.select($"id",
      VectorExpressions.dot($"a", $"b").as("dot"),
      VectorExpressions.cosine($"a", $"b").as("cos"),
      VectorExpressions.l2($"a", $"b").as("l2"),
      VectorExpressions.int8Quantize($"a").as("q8")))
  }

  test("parity: nearestCenter / nearestResidual / nearestEval") {
    val centers = Array(
      Array(1.0, 0.0, -1.0, 2.0), Array(0.0, 0.0, 0.0, 0.0),
      Array(-1.0, 1.0, -1.0, 1.0))
    assertParity(vecs.select($"id",
      VectorExpressions.nearestCenter($"a", centers).as("nc"),
      VectorExpressions.nearestResidual($"a", centers).as("nr"),
      VectorExpressions.nearestEval($"a", Array(10L, 20L, 30L), centers).as("ne")))
  }

  test("parity: binary pack / hamming / sign-bit words") {
    // hex(): a raw binary column renders as the JVM identity hash in
    // Row.toString, which differs per run regardless of content
    assertParity(vecs.select($"id",
      hex(BinaryVectors.pack($"a")).as("pa"),
      BinaryVectors.hamming(BinaryVectors.pack($"a"), BinaryVectors.pack($"b")).as("h"),
      BinaryVectors.signBitsWords($"a").as("w"),
      BinaryVectors.wordsHamming(
        BinaryVectors.signBitsWords($"a"), BinaryVectors.signBitsWords($"b")).as("wh")))
  }

  test("parity: pq encode + adc distance") {
    // 2 subspaces × 4 centroids × dim 2
    val codebooks = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(-1.0, 1.0), Array(2.0, -2.0)),
      Array(Array(0.5, 0.5), Array(-0.5, -0.5), Array(1.5, 0.0), Array(0.0, 1.5)))
    assertParity(vecs.select($"id",
      PqExpressions.pqEncode($"a", codebooks).as("codes")))
    // one ADC table per "query" (here: a single query, index 0)
    val tables = Array(Array(
      Array(0.1, 0.2, 0.3, 0.4), Array(0.4, 0.3, 0.2, 0.1)))
    assertParity(vecs.select($"id",
      PqExpressions.pqAdcDistance(
        PqExpressions.pqEncode($"a", codebooks)("codes"), lit(0), tables).as("adc")))
  }

  test("parity: one-permutation minhash (densified)") {
    assertParity(docs.select($"id",
      HashExpressions.onePermMinHash(
        HashExpressions.portableTokenHashes($"text"), 8, 1234567L, 891011L).as("oph")))
  }

  test("parity: feature kernels (bucketWeightSum, hashedBowEmbed)") {
    val weights = Array.tabulate(32)(i => (i % 7).toDouble / 7.0 - 0.4)
    assertParity(docs.select($"id",
      FeatureExpressions.bucketWeightSum(
        HashExpressions.portableTokenHashes($"text"), weights).as("bws"),
      FeatureExpressions.hashedBowEmbed($"text", 16).as("bow")))
  }

  test("parity: lowerRoot fold") {
    assertParity(docs.select($"id", BpeExpressions.lowerRoot($"text").as("lr")))
  }

  test("parity: hyperplane bucket") {
    val rnd = new scala.util.Random(7)
    val planes = Array.fill(5)(Array.fill(4)(rnd.nextGaussian()))
    val bucket = org.apache.spark.sql.GraftColumnBridge.column(
      HyperplaneBucketExpr(org.apache.spark.sql.GraftColumnBridge.expression($"a"), planes))
    assertParity(vecs.select($"id", bucket.as("bkt")))
  }

  test("parity: url canonicalize") {
    val urls = Seq(
      (0L, "HTTP://Example.COM:80/a/../b/?utm_source=x&q=1#frag"),
      (1L, "https://example.com/b/?q=1"),
      (2L, "not a url at all"),
      (3L, ""),
      (4L, "ftp://Mixed.Case/Path//double")).toDF("id", "u").orderBy("id")
    val canon = org.apache.spark.sql.GraftColumnBridge.column(
      UrlCanonicalizeExpr(org.apache.spark.sql.GraftColumnBridge.expression($"u")))
    assertParity(urls.select($"id", canon.as("cu")))
  }
}
