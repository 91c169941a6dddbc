package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the most recent right
  * row with `rightTime <= leftTime` in the same key group — the
  * time-series primitive Spark lacks as a built-in operator.
  *
  * Implemented the scalable way: tag both sides, UNION them, and run ONE
  * window pass per key ordered by time, carrying the latest right-side
  * values forward (`last(..., ignoreNulls)`). Cost: one shuffle on the
  * key, no per-row range probe, no key-explosion — the plan a 1000-executor
  * cluster wants, versus the naive correlated-subquery / inequality-join
  * forms that degenerate to per-key cross products.
  */
object AsOfJoin {

  /** @param left       the probe side (one output row per left row)
    * @param right      the reference side whose latest values attach
    * @param key        equality key column present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightVals  right-side columns to carry, emitted as
    *                   `asof_<name>` (null when no right row precedes)
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    // loud on name collisions: the helper columns and asof_<v> outputs
    // would otherwise silently clobber caller data (e.g. a second asof
    // call carrying the same rightVals name)
    val reserved = Seq("__side", "__t", "__rv") ++ rightVals.map(v => s"asof_$v")
    val clash = reserved.filter(left.columns.contains)
    require(clash.isEmpty,
      s"asof writes ${clash.mkString(", ")} but the left frame already " +
        "carries such column(s) — rename them first")
    // SQL ASOF semantics for nulls: a right row with a NULL time (or NULL
    // key) matches nothing — unfiltered, a null time sorts NULLS FIRST and
    // its values would be carried into left rows with NO true preceding
    // right row (and null keys would group and "match" each other)
    val l = left.withColumn("__side", lit(1)).withColumn("__t", col(leftTime))
    val r = right.select((Seq(key, rightTime) ++ rightVals).distinct.map(col): _*)
      .filter(col(rightTime).isNotNull && col(key).isNotNull)
      .withColumn("__side", lit(0)).withColumn("__t", col(rightTime))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // right rows sort before left rows at equal timestamps (an equal-time
    // right row is visible to the left row)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct carries the whole right ROW forward: per-column
    // last(..., ignoreNulls) would fill each value independently, so a
    // null inside a right row made the asof_* columns mix values from
    // DIFFERENT right rows — a composite matching no actual row. The
    // struct is non-null exactly on right rows; its fields ride along,
    // nulls included, which is what point-in-time semantics mean.
    val carried = unioned.withColumn("__rv",
      last(when(col("__side") === 0, struct(rightVals.map(col): _*)),
        ignoreNulls = true).over(w))
    val expanded = rightVals.foldLeft(carried) { (d, v) =>
      d.withColumn(s"asof_$v", col("__rv").getField(v))
    }
    expanded.filter(col("__side") === 1)
      .drop("__side", "__t", "__rv")
      // drop EVERY right-only helper column the union added, rightTime
      // included (it used to leak as an always-null column on the output)
      .drop((rightVals :+ rightTime).distinct.filterNot(left.columns.contains): _*)
  }
}
