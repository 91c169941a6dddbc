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

  /** Join types that stay CORRECT under right-side replication: every
    * left row carries exactly one salt, so left-preserving semantics
    * hold; a right/full outer (or right semi/anti) would emit each
    * unmatched right row once PER SALT — `saltFactor`−1 spurious rows. */
  private val SafeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "leftanti", "cross")

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
                 saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin cannot run '$joinType': the right side is replicated " +
        s"$saltFactor times, so right-preserving joins emit every unmatched " +
        "right row once per salt — use inner/left_outer/left_semi/left_anti")
    // left rows get a deterministic-per-row salt in [0, saltFactor): the
    // hash covers EVERY left column, never a nondeterministic row id — a
    // stage retry after a shuffle-fetch failure must re-derive the same
    // salt for the same row, or the join silently drops/duplicates rows
    // (monotonically_increasing_id is not stable across attempts)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    // right rows are replicated across every salt value
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"), joinType)
      .drop("__salt")
  }
}
