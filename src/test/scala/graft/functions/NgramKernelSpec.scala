package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the one-pass [[WordNgramsExpr]] kernel (r20) to the historical
  * Column/HOF formulation it replaced — the formulation re-evaluated the
  * tokenize subtree per window (O(len²) per doc), but its VALUES are the
  * contract: wordNgrams/wordShingles feed oracle-hashed gates
  * (q_text_repetition, q_dedup_ngram_jaccard, decontamination). */
class NgramKernelSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r20 formulation, verbatim (tokens → lower → windowed
    * concat_ws over slices, optional array_distinct). */
  private def oldNgrams(text: org.apache.spark.sql.Column, n: Int,
                        distinct: Boolean): org.apache.spark.sql.Column = {
    val rawToks = when(text.isNull || length(trim(text)) === 0,
      array().cast("array<string>")).otherwise(split(trim(text), "\\s+"))
    val toks = transform(rawToks, lower(_))
    val count = size(toks) - (n - 1)
    val windows = transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
    when(count < 1, array().cast("array<string>"))
      .otherwise(if (distinct) array_distinct(windows) else windows)
  }

  test("wordNgrams/wordShingles kernel == historical HOF formulation " +
    "(property, random unicode / whitespace / degenerate inputs)") {
    val rnd = new scala.util.Random(11)
    val alphabets = Seq("abXY09", "äÖüß", "句子词", "😀🙏", "Iİı")
    def token(): String = {
      val a = alphabets(rnd.nextInt(alphabets.length))
      val cps = a.codePoints().toArray
      (1 to (1 + rnd.nextInt(6))).map(_ =>
        new String(Character.toChars(cps(rnd.nextInt(cps.length))))).mkString
    }
    val seps = Seq(" ", "  ", "\t", " \n ")
    val texts: Seq[String] =
      (1 to 50).map { _ =>
        (1 to (1 + rnd.nextInt(9))).map(_ => token())
          .mkString(seps(rnd.nextInt(seps.length)))
      } ++ Seq(null, "", "   ", "one", "a b", "A  A a\ta", " pad ")
    val df = texts.toDF("text")
    for (n <- Seq(2, 3, 5); distinct <- Seq(false, true)) {
      val col = if (distinct) graft.functions.TextFunctions.wordShingles(expr("text"), n)
                else graft.functions.TextFunctions.wordNgrams(expr("text"), n)
      val got = df.select(col).collect().map(_.getSeq[String](0))
      val want = df.select(oldNgrams(expr("text"), n, distinct))
        .collect().map(_.getSeq[String](0))
      got.zip(want).zip(texts).foreach { case ((g, w), t) =>
        assert(g == w, s"n=$n distinct=$distinct text='$t'")
      }
    }
  }

  test("sortedStringJaccard over sorted shingles == array_intersect/union " +
    "jaccard over unsorted (property)") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("a", "bb", "c d", "Ü", "词", "😀", "zz9")
    val pairs = (1 to 60).map { _ =>
      def arr() = (0 until rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .distinct
      (arr(), arr())
    } :+ ((Seq.empty[String], Seq.empty[String])) :+ ((Seq("a"), Seq.empty[String]))
    val df = pairs.toDF("a", "b")
    val got = df.select(graft.functions.HashExpressions.sortedStringJaccard(
      sort_array(col("a")), sort_array(col("b")))).collect().map(_.getDouble(0))
    val want = df.select(graft.functions.TextFunctions.jaccard(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    got.zip(want).zip(pairs).foreach { case ((g, w), p) =>
      assert(g == w, s"pair $p")
    }
  }
}
