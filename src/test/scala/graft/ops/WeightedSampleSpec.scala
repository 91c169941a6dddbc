package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic across runs and partitionings") {
    val df = (1 to 500).map(i => (i.toLong, (i % 7 + 1).toDouble)).toDF("id", "w")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(d, "w", k = 50, idCol = "id")
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val a = ids(df)
    assert(a == ids(df.repartition(13)))
    assert(a.length == 50 && a.distinct.length == 50)
  }

  test("inclusion probability tracks the weight (9x overrepresentation)") {
    // 500 heavy (w=9) + 500 light (w=1) rows; k=100 at a 10% sampling
    // fraction should pick heavies at ~9:1 odds — E[heavy] ≈ 90
    val df = (1 to 1000).map(i => (i.toLong, if (i % 2 == 0) 9.0 else 1.0)).toDF("id", "w")
    val heavy = Sampling.weightedSample(df, "w", k = 100, idCol = "id")
      .filter(col("w") === 9.0).count()
    assert(heavy > 75 && heavy < 99, s"got $heavy/100 heavy rows, expected ~90")
  }

  test("k beyond the population returns everything; non-positive weights drop") {
    val df = Seq((1L, 1.0), (2L, 0.0), (3L, -2.0), (4L, 5.0)).toDF("id", "w")
    val got = Sampling.weightedSample(df, "w", k = 10, idCol = "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("schema passes through unchanged (no helper columns leak)") {
    val df = Seq((1L, 2.0, "x")).toDF("id", "w", "payload")
    val out = Sampling.weightedSample(df, "w", k = 1, idCol = "id")
    assert(out.columns.toSeq == Seq("id", "w", "payload"))
  }

  test("NaN weights are excluded, not crowned: they would rank ABOVE every real weight") {
    // Spark orders NaN above all numbers, so an unfiltered NaN key (w =
    // x/0.0 upstream) passes `> 0` AND wins the whole top-k
    val df = ((1 to 50).map(i => (i.toLong, 1.0)) ++
      (100 to 160).map(i => (i.toLong, 0.0 / 0.0))).toDF("id", "w")
    val got = Sampling.weightedSample(df, "w", k = 20, idCol = "id")
      .select("id").collect().map(_.getLong(0))
    assert(got.length == 20 && got.forall(_ <= 50), s"NaN rows crowned: ${got.toSeq}")
  }

  test("string ids bucket portably instead of silently emptying the portable ops") {
    // cast-to-long NULLed crawl-UUID ids and dropped EVERY row from the
    // mix/split ops; string ids now fold codepoints (the shardOf fold)
    val docs = (1 to 300).map(i =>
      (s"doc-${i}a", if (i % 3 == 0) "web" else "books")).toDF("id", "source")
    val mixed = Sampling.mixToTarget(docs, "source",
      Map("web" -> 0.5, "books" -> 0.5), idCol = "id")
    val bySource = mixed.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.getOrElse("web", 0L) > 0 && bySource.getOrElse("books", 0L) > 0,
      s"string-id mix silently emptied: $bySource")
    // deterministic under repartitioning, like the numeric face
    val again = Sampling.mixToTarget(docs.repartition(7), "source",
      Map("web" -> 0.5, "books" -> 0.5), idCol = "id")
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(again == mixed.select("id").collect().map(_.getString(0)).sorted.toSeq)
    // the fold is the SAME math as WebDataset's shard assignment
    val folded = Seq("k1", "a/000123", "doc-7x").toDF("s")
      .select(graft.functions.HashExpressions.portableStringFold(col("s")))
      .collect().map(_.getLong(0))
    val expect = Seq("k1", "a/000123", "doc-7x").map { s =>
      var h = 0L; var ci = 0
      while (ci < s.length) {
        val cp = s.codePointAt(ci)
        h = (h * graft.functions.HashExpressions.B + cp) % Sampling.PortableP
        ci += Character.charCount(cp)
      }
      h
    }
    assert(folded.toSeq == expect)
    // numeric ids (and numeric STRINGS) keep the exact historical bucket
    val numeric = Seq(7L).toDF("id").select(Sampling.portableBucket(col("id")))
      .head().getLong(0)
    val numericStr = Seq("7").toDF("id").select(Sampling.portableBucket(col("id")))
      .head().getLong(0)
    assert(numeric == (7L * 2654435761L + 42L) % Sampling.PortableP)
    assert(numericStr == numeric)
  }

  test("all-zero split weights fail loudly instead of labeling everything last") {
    val df = Seq((1L, "x")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Sampling.split(df, "id", Seq("train" -> 0.0, "test" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitPortable(df, "id", Seq("train" -> 0.0, "test" -> 0.0))
    }
  }
}
