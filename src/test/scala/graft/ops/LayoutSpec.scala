package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleaveBits refuses bits <= 0 with a named precondition") {
    val e = intercept[IllegalArgumentException] {
      Layout.interleaveBits(Seq(org.apache.spark.sql.functions.lit(1L)), bits = 0)
    }
    assert(e.getMessage.contains("bits"), e.getMessage) // not empty.reduce
  }

  test("interleaveBits matches hand-computed Morton codes") {
    // x=3 (0b11), y=1 (0b01), 2 bits: z = y1 x1 y0 x0 = 0 1 1 1 = 7
    val df = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), bits = 2).as("z"))
    assert(df.head().getLong(0) == 7L)
    // identity on one column: interleaving k=1 is a no-op
    val one = Seq(173L).toDF("x")
      .select(Layout.interleaveBits(Seq(col("x")), bits = 8).as("z"))
    assert(one.head().getLong(0) == 173L)
  }

  test("withZValue stays in [0, 4^bits) and is deterministic") {
    val df = (0 until 500).map(i => (i.toLong * 7 % 97, i.toLong * 13 % 89)).toDF("x", "y")
    val z = Layout.withZValue(df, Seq("x", "y"), bits = 8)
    val vals = z.select("z_value").as[Long].collect()
    assert(vals.forall(v => v >= 0 && v < (1L << 16)))
    val again = Layout.withZValue(df, Seq("x", "y"), bits = 8).select("z_value").as[Long].collect()
    assert(vals.toSeq == again.toSeq)
  }

  test("z-ordered layout touches fewer files than single-column sort for a 2-D box filter") {
    val grid = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString

    Layout.zorder(df, Seq("x", "y"), numPartitions = 16, bits = 5)
      .write.mode("overwrite").parquet(s"$tmp/zorder")
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$tmp/xsort")

    def filesHit(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x") < 8 && col("y") < 8)
        .select(input_file_name()).distinct().count()

    val (zHit, xHit) = (filesHit(s"$tmp/zorder"), filesHit(s"$tmp/xsort"))
    // the 8x8 box is 1/16 of the space: z-order confines it to ~1 file,
    // an x-only sort smears it across every file holding x<8 (~4 of 16)
    assert(zHit < xHit, s"z-order hit $zHit files, x-sort hit $xHit")
    assert(zHit <= 2)
    // correctness: both layouts return the identical row set
    val a = spark.read.parquet(s"$tmp/zorder").filter(col("x") < 8 && col("y") < 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == (for { x <- 0 until 8; y <- 0 until 8 } yield (x.toLong, y.toLong)).toSet)
  }

  test("clusterBySimilarity co-locates identical vectors in one partition") {
    // two antipodal groups: every hyperplane separates them, so the two
    // bucket values differ maximally and range partitioning splits them
    val base = Array.tabulate(8)(i => (i + 1).toFloat)
    val rows = (0 until 40).map { i =>
      val sign = if (i % 2 == 0) 1f else -1f
      (i.toLong, base.map(_ * sign).toSeq)
    }
    val df = rows.toDF("vec_id", "vector")
    val placed = Layout.clusterBySimilarity(df, bits = 8, vecCol = "vector", numPartitions = 4)
      .withColumn("pid", spark_partition_id())
      .select("vec_id", "pid").collect().map(r => (r.getLong(0) % 2, r.getInt(1)))
    val groupParts = placed.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // each sign group maps to exactly one bucket -> at most one partition each,
    // and the two groups do not share a partition
    assert(groupParts(0L).size == 1 && groupParts(1L).size == 1)
    assert((groupParts(0L) & groupParts(1L)).isEmpty)
  }

  test("constant column degrades gracefully (bucket 0, layout still valid)") {
    val df = (0 until 50).map(i => (5L, i.toLong)).toDF("x", "y")
    val z = Layout.withZValue(df, Seq("x", "y"), bits = 4)
    assert(z.select("z_value").as[Long].collect().forall(v => v >= 0 && v < (1L << 8)))
  }
}
