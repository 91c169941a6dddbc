package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys: when one join key carries a disproportionate
  * share of rows (the classic hot-key problem at 100 TB), a plain shuffle
  * join puts the whole hot key in one task. Salting splits each left-side
  * key into `saltFactor` synthetic sub-keys and replicates the right side
  * across them, so the hot key spreads over `saltFactor` tasks.
  *
  * AQE's skew-join handles this at runtime for sort-merge joins
  * (GraftSession enables it); this operator is the explicit form for plans
  * AQE can't rewrite (e.g. when the skewed side feeds an aggregation
  * pipeline) and documents the pattern the engine expects at scale.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    // left rows get a deterministic-per-row salt in [0, saltFactor)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(leftKey), monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    // right rows are replicated across every salt value
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"), joinType)
      .drop("__salt")
  }
}
