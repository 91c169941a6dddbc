package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-window) join: left rows whose timestamp falls inside
  * `[rightStart, rightStart + window)` — the classic inequality join that
  * naive planning turns into a broadcast-nested-loop / cartesian product.
  *
  * Implemented with bin bucketing: both sides are assigned
  * `window`-granularity time bins; a point inside a window can only live
  * in the window's start bin or the next one, so the right side explodes
  * into exactly 2 bins and the join becomes a plain equi-join on bin
  * (one hash shuffle) followed by the exact range filter. At 100 TB this
  * is the difference between O(n·m) comparisons and O(matches).
  */
object RangeJoin {

  /** Columns of `points`/`windows` survive with their original names —
    * disambiguate before calling if they overlap. */
  def pointInWindow(points: DataFrame, windows: DataFrame,
                    pointTs: String, windowStart: String,
                    windowMinutes: Int): DataFrame = {
    // windowMinutes <= 0 would DIV-by-zero into NULL bins under the
    // session's ANSI-off config — every join key null, EMPTY result, no
    // error (silent data loss, not an exception)
    require(windowMinutes > 0, s"windowMinutes must be positive: $windowMinutes")
    val winUs = windowMinutes.toLong * 60L * 1000000L
    // bins derive from the ALREADY-COMPUTED __*_us columns: interpolating
    // the raw column name into expr() recomputed unix_micros up to three
    // times and broke for names needing backticks
    val p = points.withColumn("__pt_us", unix_micros(col(pointTs)))
      .withColumn("__bin", expr(s"__pt_us DIV ${winUs}L"))
    val w = windows.withColumn("__ws_us", unix_micros(col(windowStart)))
      .withColumn("__bin",
        explode(array(expr(s"__ws_us DIV ${winUs}L"),
          expr(s"__ws_us DIV ${winUs}L") + 1)))
    p.join(w, "__bin")
      .filter(col("__pt_us") >= col("__ws_us") && col("__pt_us") < col("__ws_us") + winUs)
      .drop("__bin", "__pt_us", "__ws_us")
  }
}
