package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: persisting both join sides bucketed (and
  * sorted) on the join key lets every subsequent join run WITHOUT a
  * shuffle — the bucket layout IS the hash partitioning, computed once at
  * write time. The amortization case at 100 TB: any fact table joined
  * repeatedly on the same key (lineitem ⋈ orders on orderkey) should be
  * stored this way.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
