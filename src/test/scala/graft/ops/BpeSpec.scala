package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich fixture: {low:5, lower:2, newest:6, widest:3}
  private def corpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("pairStats counts adjacent symbol pairs weighted by word frequency") {
    val stats = Bpe.pairStats(corpus, topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'e s' appears once in newest (6) and once in widest (3) = 9
    assert(stats("e s") == 9L)
    // 's t' likewise 9; 't </w>' ends newest and widest = 9
    assert(stats("s t") == 9L && stats("t </w>") == 9L)
    // 'l o' in low (5) and lower (2) = 7; 'w </w>' only ends low = 5
    assert(stats("l o") == 7L && stats("w </w>") == 5L)
  }

  test("train learns the hand-derivable first merges") {
    val model = Bpe.train(corpus, numMerges = 4)
    // round 1 ties at 9 ('e s', 's t', 't </w>') -> lexicographic: "e s"
    assert(model.merges.head == ("e", "s"))
    // after merging 'es': 'es t' = 9 ties with 't </w>'... 'es t' < 't </w>'
    assert(model.merges(1) == ("es", "t"))
    // then 'est </w>' = 9 is the unique max
    assert(model.merges(2) == ("est", "</w>"))
    assert(model.merges(3) == ("l", "o")) // 7 beats the 6s
  }

  test("encode applies merges in rank order and round-trips") {
    val model = Bpe.train(corpus, numMerges = 10)
    val enc = Bpe.encode(Seq((1L, "newest lowest low")).toDF("doc_id", "text"), model)
    val subs = enc.head().getAs[scala.collection.Seq[String]]("subwords").toList
    // trained subword 'est</w>' segments the UNSEEN word 'lowest' too
    assert(subs.contains("est</w>"))
    assert(Bpe.detokenize(subs) == "newest lowest low")
    // n_subwords is the model-ready token count
    assert(enc.head().getAs[Int]("n_subwords") == subs.length)
  }

  test("encoding the training corpus reproduces the trainer's symbolization") {
    val model = Bpe.train(corpus, numMerges = 6)
    val enc = Bpe.encode(corpus.filter(col("doc_id") === 3), model)
      .head().getAs[scala.collection.Seq[String]]("subwords").toSet
    // 'newest' x6 -> whatever the trainer collapsed it to; with 6 merges
    // the word is fully merged or near-fully — crucially, detokenizable
    assert(Bpe.detokenize(enc.toSeq) != "")
    // and encode of a null/empty text is an empty array, not a crash
    val empty = Bpe.encode(Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text"), model)
      .collect().map(_.getAs[scala.collection.Seq[String]]("subwords"))
    assert(empty.forall(_.isEmpty))
  }

  test("minFreq stops training before degenerate merges") {
    val tiny = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val model = Bpe.train(tiny, numMerges = 50, minFreq = 2)
    // only pairs with corpus frequency >= 2 can merge: 'a b' (2) and
    // 'ab </w>' (2); 'c d'/'cd </w>' (1) must not
    assert(model.merges.toSet == Set(("a", "b"), ("ab", "</w>")))
  }

  test("save/load round-trips the model; reloaded encode is bit-identical") {
    val model = Bpe.train(corpus, numMerges = 10, minFreq = 1)
    val dir = java.nio.file.Files.createTempDirectory("bpe-model").toString + "/m"
    Bpe.save(spark, model, dir)
    val reloaded = Bpe.load(spark, dir)
    assert(reloaded.merges == model.merges) // order IS the model
    val a = Bpe.encode(corpus, model).collect().map(_.toString).sorted
    val b = Bpe.encode(corpus, reloaded).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
