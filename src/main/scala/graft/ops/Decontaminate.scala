package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Eval-set decontamination: flag evaluation documents whose word-n-gram
  * shingles are heavily contained in the training corpus — the standard
  * benchmark-leakage check run before training on web-scale data.
  *
  * Shape: explode both sides to (doc, shingle) rows, LEFT SEMI join the
  * eval shingles against the DISTINCT train shingle set, and compare the
  * surviving count to the doc's shingle count. Everything is equi-join +
  * aggregation — at 100 TB the train shingle set shuffles once (or lives
  * as a bucketed table) and each eval doc costs |shingles| probe rows.
  */
object Decontaminate {

  /** @return one row per eval doc: total shingles, how many appear
    *         anywhere in train, the containment fraction, and the flag. */
  def containment(train: DataFrame, eval: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val trainShingles = train
      .select(explode(TextFunctions.wordShingles(col(textCol), shingleSize)).as("sh"))
      .distinct()
    val evalShingles = eval
      .select(col(idCol), explode(TextFunctions.wordShingles(col(textCol), shingleSize)).as("sh"))
    // One pass over the eval side: a left-outer probe against the DISTINCT
    // train set cannot fan out, so total and shared counts come from the
    // same aggregate (two scans + two aggs otherwise).
    evalShingles
      .join(trainShingles.withColumn("__hit", lit(1)), Seq("sh"), "left_outer")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("n_shared"))
      .select(
        col(idCol),
        col("n_shingles"),
        col("n_shared"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6).as("containment"))
      .withColumn("contaminated", col("containment") >= threshold)
  }
}
