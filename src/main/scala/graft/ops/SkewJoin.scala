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

  /** True iff `xxhash64` accepts the type: MapType (at any nesting depth)
    * is unhashable in Spark without a legacy flag — hashing would throw
    * AnalysisException for frames carrying e.g. the canonical metadata
    * map. Such columns are skipped when deriving the salt. */
  private def hashSafe(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashSafe(f.dataType))
      case a: ArrayType => hashSafe(a.elementType)
      case _ => true
    }
  }

  /** @param saltCols columns the per-row salt hashes over. Default (empty):
    *                 every HASH-SAFE left column — map-typed columns are
    *                 skipped, so frames carrying the canonical metadata map
    *                 salt on their remaining columns. Pass explicitly when
    *                 the hash-safe columns don't spread the hot key (e.g. a
    *                 stable tiebreak column such as a content hash or
    *                 pre-assigned row number — it must be deterministic
    *                 per row ACROSS STAGE RETRIES, which
    *                 monotonically_increasing_id is not).
    *
    * CAVEAT: byte-identical duplicate left rows hash to the SAME salt by
    * construction (any deterministic row function must), so a hot key made
    * of exact-duplicate rows stays in one task — dedup first, or provide a
    * distinguishing `saltCols` column. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
                 saltFactor: Int = 8, joinType: String = "inner",
                 saltCols: Seq[String] = Nil): DataFrame = {
    require(SafeJoinTypes.contains(joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")),
      s"saltedJoin cannot run '$joinType': the right side is replicated " +
        s"$saltFactor times, so right-preserving joins emit every unmatched " +
        "right row once per salt — use inner/left_outer/left_semi/left_anti")
    // left rows get a deterministic-per-row salt in [0, saltFactor): the
    // hash covers the hash-safe left columns, never a nondeterministic row
    // id — a stage retry after a shuffle-fetch failure must re-derive the
    // same salt for the same row, or the join silently drops/duplicates
    // rows (monotonically_increasing_id is not stable across attempts)
    val hashCols =
      if (saltCols.nonEmpty) {
        val missing = saltCols.filterNot(left.columns.contains)
        require(missing.isEmpty, s"saltCols not in left frame: ${missing.mkString(", ")}")
        saltCols
      } else {
        val safe = left.schema.fields.filter(f => hashSafe(f.dataType)).map(_.name).toSeq
        require(safe.nonEmpty,
          "no hash-safe left columns to derive a salt from (every column " +
            "contains a map type) — pass saltCols naming a hashable column")
        safe
      }
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(hashCols.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    // right rows are replicated across every salt value
    val saltedRight = right.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"), joinType)
      .drop("__salt")
  }
}
