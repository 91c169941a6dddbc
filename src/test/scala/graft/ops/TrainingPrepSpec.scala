package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // token counts: 3, 4, 2, 5 — budget 6 ⇒ stream offsets 0,3,7,9
  private lazy val docs = Seq(
    (1L, "a b c"), (2L, "d e f g"), (3L, "h i"), (4L, "j k l m n"))
    .toDF("doc_id", "text")

  test("concatSplitPack lays out the exact concat-then-split offsets") {
    val out = Packing.concatSplitPack(docs, tokenBudget = 6, numShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "seq_id", "token_offset", "spans_boundary")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, false), // toks 0-2 of seq 0
      (2L, 0L, 3L, true),  // toks 3-6: spills into seq 1
      (3L, 1L, 1L, false), // toks 7-8
      (4L, 1L, 3L, true))) // toks 9-13: spills into seq 2
  }

  test("duplicate doc ids never double-book a slot (ROWS frame, not RANGE peers)") {
    // the default RANGE frame sums equal-key PEERS together, handing both
    // copies the same start offset — the layout must stay non-overlapping
    // even on non-deduped input
    val dup = Seq((1L, "a b c"), (1L, "a b c"), (2L, "d e"))
      .toDF("doc_id", "text")
    val out = Packing.concatSplitPack(dup, tokenBudget = 100, numShards = 1)
      .select("doc_id", "n_tokens", "token_offset")
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._3)).toSeq
    val offsets = out.map(_._3)
    assert(offsets.distinct.length == offsets.length,
      s"overlapping slots: $out")
    // slots tile the stream exactly: total span == total tokens
    assert(offsets.zip(out.map(_._2)).map { case (o, n) => o + n }.max == 8L)
  }

  test("null text packs as zero tokens without corrupting later offsets") {
    val withNull = Seq((1L, "a b c"), (2L, null: String), (3L, "d e"))
      .toDF("doc_id", "text")
    val out = Packing.concatSplitPack(withNull, tokenBudget = 4, numShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_id", "token_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 0L, 0L), (2L, 0L, 0L, 3L), (3L, 2L, 0L, 3L)), out.toString)
  }

  test("layout is deterministic under repartitioning and shard count splits the stream") {
    val base = Tables(spark, sf(), "documents")
    val a = Packing.concatSplitPack(base, 512, numShards = 4)
      .select("doc_id", "shard", "seq_id", "token_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val b = Packing.concatSplitPack(base.repartition(7), 512, numShards = 4)
      .select("doc_id", "shard", "seq_id", "token_offset")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(a == b && a.nonEmpty)
    assert(a.values.map(_._1).toSet.size == 4, "all shards populated")
  }

  test("duplicate-id layout is deterministic under repartitioning (n_tokens tiebreak)") {
    // same id, DIFFERENT lengths: without a secondary order key, which
    // duplicate gets which offset was an arbitrary tie-break that could
    // differ across partitionings — the n_tokens tiebreak pins it (and
    // equal-length duplicates are interchangeable: identical output rows)
    val dup = Seq((1L, "a b c d e"), (1L, "x y"), (1L, "x y"), (2L, "p q r"))
      .toDF("doc_id", "text")
    def layout(df: org.apache.spark.sql.DataFrame) =
      Packing.concatSplitPack(df, tokenBudget = 100, numShards = 1)
        .select("doc_id", "n_tokens", "token_offset")
        .as[(Long, Long, Long)].collect().sorted.toSeq
    val runs = Seq(dup, dup.repartition(5), dup.orderBy(col("text").desc),
      dup.repartition(3, col("text"))).map(layout)
    assert(runs.distinct.size == 1, runs.toString)
    // the short duplicates pack BEFORE the long one (ascending n_tokens)
    val one = runs.head.filter(_._1 == 1L)
    assert(one == Seq((1L, 2L, 0L), (1L, 2L, 2L), (1L, 5L, 4L)), one.toString)
  }

  test("packStats shows every non-final sequence filled to the budget") {
    val packed = Packing.concatSplitPack(Tables(spark, sf(), "documents"), 256, numShards = 2)
    val stats = Packing.packStats(packed, 256)
      .select("shard", "seq_id", "filled_to")
      .as[(Long, Long, Long)].collect()
    val lastSeq = stats.groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2).max }
    stats.foreach { case (shard, seq, filled) =>
      if (seq < lastSeq(shard)) assert(filled == 256L, s"shard $shard seq $seq: $filled")
    }
    assert(stats.nonEmpty)
  }
}

class MixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sf("sf0.01"), "documents")

  test("mixToTarget keeps the binding source whole and hits the target mixture") {
    val out = Sampling.mixToTarget(docs, "source",
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), "doc_id")
    val counts = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("src0", "src1", "src2"), "unweighted sources dropped")
    // 25 docs per source; weights ⇒ total 50: src0 rate 1.0 (binding, kept whole)
    assert(counts("src0") == 25L)
    // hash sampling is approximate at n=25, but ordering must hold
    assert(counts("src1") < 25L && counts("src2") < counts("src1") + 5)
    val total = counts.values.sum.toDouble
    assert(math.abs(counts("src0") / total - 0.5) < 0.15, counts.toString)
  }

  test("mix counts exchange is reused; documents scanned at most twice") {
    val out = Sampling.mixToTarget(docs, "source",
      Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2), "doc_id").select("doc_id")
    out.collect()
    val finalPlan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(finalPlan.contains("ReusedExchange"), finalPlan)
    assert("FileScan parquet".r.findAllIn(finalPlan).length <= 2, finalPlan)
    assert(finalPlan.contains("In(source"), "source filter not pushed:\n" + finalPlan)
  }

  test("mixToTarget membership is stable under repartitioning") {
    val w = Map("src0" -> 0.6, "src3" -> 0.4)
    val a = Sampling.mixToTarget(docs, "source", w, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.mixToTarget(docs.repartition(9), "source", w, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  private def withTokens(df: org.apache.spark.sql.DataFrame) = df.withColumn("n_tokens",
    when(col("text").isNull || length(trim(col("text"))) === 0, 0L)
      .otherwise(size(split(trim(lower(col("text"))), "\\s+")).cast("long")))

  test("mixToTokenBudget tracks per-source token budgets within one bucket's overshoot") {
    val d = withTokens(docs)
    val shares = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val out = Sampling.mixToTokenBudget(d, "source", shares, totalTokens = 3000L,
      tokensCol = "n_tokens", idCol = "doc_id", nBuckets = 16)
    val kept = out.groupBy("source").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val available = d.filter(col("source").isin("src0", "src1", "src2"))
      .groupBy("source").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    shares.foreach { case (src, share) =>
      val budget = math.floor(share * 3000).toLong
      val t = kept(src)
      if (available(src) <= budget) assert(t == available(src), s"$src not kept whole")
      else {
        // budget reached, overshoot bounded by the largest single bucket
        val maxBucket = d.filter(col("source") === src)
          .groupBy(org.apache.spark.sql.functions.pmod(
            Sampling.portableBucket(col("doc_id")), lit(16L)).as("b"))
          .agg(sum("n_tokens").as("t")).agg(max("t")).head().getLong(0)
        assert(t >= budget - maxBucket && t < budget + maxBucket,
          s"$src kept $t vs budget $budget (max bucket $maxBucket)")
      }
    }
  }

  test("DSIR weights rank target-like docs above off-target docs") {
    import graft.ops.Dsir
    val target = Seq((100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "a quick brown dog and the lazy fox"),
      (102L, "the fox and the dog are quick and lazy"))
      .toDF("doc_id", "text")
    val source = Seq((200L, "lorem ipsum dolor sit amet consectetur"),
      (201L, "adipiscing elit sed do eiusmod tempor"),
      (202L, "the quick brown fox jumps again"),
      (203L, "incididunt ut labore et dolore magna"))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(source, target, source, dim = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the fox doc shares the target's vocabulary; the lorem docs don't
    assert(w(202L) > w(200L) && w(202L) > w(201L) && w(202L) > w(203L), w.toString)
    // null text scores the empty weight, not an error
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(Dsir.weightsWithTable(nulls, Array.fill(8)(5L)).collect()
      .head.getLong(1) == 0L)
  }

  test("DSIR scoring plan is a single pass: no shuffle, no explode, no join") {
    import graft.ops.Dsir
    val plan = Dsir.weightsWithTable(docs, Array.fill(64)(1L))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in scoring plan:\n$plan")
    assert(!plan.contains("Generate"), s"unexpected explode in scoring plan:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in scoring plan:\n$plan")
  }

  test("DSIR select draws k docs, strongly favoring target-vocabulary docs") {
    import graft.ops.Dsir
    // corpus: 4 docs speak the target vocabulary, 16 speak another one
    val talk = "the quick brown fox jumps over the lazy dog again and again"
    val noise = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    val corpus = ((0 until 4).map(i => (i.toLong, talk + s" t$i")) ++
      (4 until 20).map(i => (i.toLong, noise + s" n$i"))).toDF("doc_id", "text")
    val target = Seq((100L, "a quick brown dog and a lazy fox jumps"))
      .toDF("doc_id", "text")
    val out = Dsir.select(corpus, target, corpus, k = 4, dim = 32)
    assert(out.count() == 4)
    // exp(likelihood-ratio) weights separate the vocabularies by orders of
    // magnitude, so the draw must pick mostly (at least 3 of 4) fox docs
    assert(out.filter(col("doc_id") < 4).count() >= 3)
    // and the weight column survives selection for downstream auditing
    assert(out.columns.contains("lw6") && out.columns.contains("dsir_weight"))
  }

  test("mixToTokenBudget keeps a tiny-share source's first bucket, never drops it") {
    val d = withTokens(docs)
    // src2's floored budget is 0 tokens (1e-9 of 1000); the documented
    // contract still gives it its first bucket, not an empty split
    val shares = Map("src0" -> 1.0, "src2" -> 1e-9)
    val out = Sampling.mixToTokenBudget(d, "source", shares, totalTokens = 1000L,
      tokensCol = "n_tokens", idCol = "doc_id", nBuckets = 8)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.getOrElse("src2", 0L) > 0L, s"tiny-share source dropped: $bySrc")
    // and it kept only the one cutoff bucket, not the whole source
    val allSrc2 = d.filter(col("source") === "src2").count()
    assert(bySrc("src2") < allSrc2)
  }

  test("mixToTokenBudget is deterministic and a subset of the source restriction") {
    val d = withTokens(docs)
    val shares = Map("src0" -> 0.6, "src1" -> 0.4)
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixToTokenBudget(df, "source", shares, 1000L, "n_tokens", "doc_id",
        nBuckets = 8).select("doc_id").collect().map(_.getLong(0)).toSet
    val a = run(d); val b = run(d.repartition(7))
    assert(a == b && a.nonEmpty)
    val allowed = d.filter(col("source").isin("src0", "src1"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(allowed))
  }
}

class KeepBestSpec extends SparkSpec {
  import spark.implicits._

  test("collapseKeepBest elects max score then min id; singletons survive") {
    val df = Seq(
      (1L, "Same Text", 5), (2L, "same text  ", 9), (3L, " SAME TEXT", 9),
      (4L, "unique", 1)
    ).toDF("doc_id", "text", "score")
    val out = Dedup.collapseKeepBest(df, col("score")).collect()
      .map(r => r.getString(3) -> (r.getLong(0), r.getInt(1), r.getLong(2))).toMap
    assert(out.size == 2)
    val dup = out.values.find(_._3 == 3L).get
    assert(dup._1 == 2L && dup._2 == 9) // score 9 beats 5; tie 2 vs 3 -> min id
    assert(out.values.exists(v => v._1 == 4L && v._3 == 1L))
  }

  test("keep-best with a constant score degrades to exactDuplicates' min-id pick") {
    val docs = Tables(spark, sf("sf0.001"), "documents")
    val planted = docs.unionByName(
      docs.filter(col("doc_id") % 7 === 0).withColumn("doc_id", col("doc_id") + 5000L))
    val best = Dedup.collapseKeepBest(planted, lit(1))
      .select("keep_id", "n_copies", "content_md5")
    val minId = Dedup.exactDuplicates(planted)
    assert(best.except(minId).isEmpty && minId.except(best).isEmpty)
  }
}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 round trip: codes bounded, reconstruction within half a step") {
    val out = Tables(spark, sf(), "embeddings").select(
      VectorFunctions.int8Scale(col("embedding")).as("s"),
      array_max(transform(VectorFunctions.quantizeInt8(col("embedding")), abs(_))).as("qmax"),
      VectorFunctions.int8MaxAbsError(col("embedding")).as("err"))
      .as[(Double, Int, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (s, qmax, err) =>
      assert(qmax <= 127, s"code out of int8 range: $qmax")
      assert(err <= s / 2 + 1e-12, s"err $err above half-step ${s / 2}")
    }
  }

  test("fused kernel agrees with the HOF composition on real embeddings") {
    val e = Tables(spark, sf(), "embeddings").limit(200)
    val hof = e.select(col("vec_id"),
      VectorFunctions.int8Scale(col("embedding")).as("s"),
      VectorFunctions.quantizeInt8(col("embedding")).as("q"),
      VectorFunctions.int8MaxAbsError(col("embedding")).as("err"))
    val kernel = e.select(col("vec_id"),
      graft.functions.VectorExpressions.int8Quantize(col("embedding")).as("k"))
      .select(col("vec_id"), col("k.scale").as("s"), col("k.codes").as("q"),
        col("k.max_err").as("err"))
    val h = hof.collect().map(r => r.getLong(0) ->
      ((r.getDouble(1), r.getSeq[Int](2), r.getDouble(3)))).toMap
    val k = kernel.collect().map(r => r.getLong(0) ->
      ((r.getDouble(1), r.getSeq[Int](2), r.getDouble(3)))).toMap
    assert(k == h && k.nonEmpty)
  }

  test("zero vectors quantize to zeros with zero error") {
    val df = Seq((1L, Array(0f, 0f, 0f))).toDF("id", "embedding")
    val r = df.select(
      VectorFunctions.int8Scale(col("embedding")).as("s"),
      array_join(transform(VectorFunctions.quantizeInt8(col("embedding")),
        _.cast("string")), ",").as("q"),
      VectorFunctions.int8MaxAbsError(col("embedding")).as("err"))
      .as[(Double, String, Double)].head()
    assert(r == ((0.0, "0,0,0", 0.0)))
  }
}

class ClusteringSpec extends graft.SparkSpec {

  private lazy val emb = graft.Tables(spark, sf(), "embeddings")

  test("inertia is non-increasing over Lloyd's iterations") {
    val inertias = (1 to 4).map(i =>
      Clustering.inertia(Clustering.kmeans(emb, k = 8, iters = i)))
    inertias.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia rose: $inertias")
    }
    assert(inertias.last < inertias.head, inertias.toString)
  }

  test("assignment is deterministic under repartitioning") {
    val c = Clustering.initCenters(emb, 8)
    val a = Clustering.assign(emb, c)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Clustering.assign(emb.repartition(7), c)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("farthest-point init covers planted blobs that lowest-id seeding clumps into one") {
    import spark.implicits._
    // 4 tight blobs; ids ordered so the 4 LOWEST ids all sit in blob 0 —
    // the adversarial case for lowest-id seeding. Deterministic data and
    // deterministic algorithms make this a fixed comparison.
    val rnd = new scala.util.Random(3)
    val blobs = for (b <- 0 until 4; j <- 0 until 25) yield {
      val v = Array.tabulate(8)(d => (if (d == 2 * b) 10f else 0f) + rnd.nextFloat() * 0.1f)
      (b * 25L + j, v.toSeq) // ids 0..24 = blob 0, 25..49 = blob 1, ...
    }
    val df = blobs.map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val naive = Clustering.inertia(Clustering.kmeans(df, k = 4, iters = 1))
    val far = Clustering.inertia(Clustering.kmeans(df, k = 4, iters = 1, farthestInit = true))
    // naive seeds (ids 0-3) are all inside blob 0: three blobs sit ~14
    // units from every center. Farthest-point picks one seed per blob.
    assert(far < naive / 10, s"farthest $far vs naive $naive")
    val centers = Clustering.initCentersFarthest(df, 4)
    assert(centers.count() == 4)
    assert(centers.select("center_id").distinct().count() == 4)
  }

  test("every vector lands in exactly one cluster from the seed set") {
    val out = Clustering.kmeans(emb, k = 8, iters = 2)
    assert(out.count() == emb.count())
    assert(out.select("cluster_id").distinct().count() <= 8)
  }
}

/** Leakage-safe split: assignment by near-dup component representative. */
class LeakageSafeSplitSpec extends SparkSpec {
  import spark.implicits._

  test("near-duplicates never straddle the split; unpaired rows match splitPortable") {
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // synthetic near-dup graph: a chain {1,2,3} and a pair {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val m = Sampling.leakageSafeSplit(docs, pairs, "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m.size == 100)
    // every component lands whole — the invariant the operator exists for
    assert(Set(m(1L), m(2L), m(3L)).size == 1, "chain component straddled the split")
    assert(m(10L) == m(11L), "pair component straddled the split")
    // members inherit the REPRESENTATIVE's (min id) assignment, and
    // unpaired rows degrade to the plain portable split exactly
    val solo = Sampling.splitPortable(docs, "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m(2L) == solo(1L) && m(3L) == solo(1L) && m(11L) == solo(10L))
    (0L until 100L).filterNot(Set(2L, 3L, 11L)).foreach(i =>
      assert(m(i) == solo(i), s"unpaired row $i diverged from splitPortable"))
  }
}
