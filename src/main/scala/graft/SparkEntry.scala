package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per SURVEY §2 line);
  * `oracleSql` gives the DuckDB-equivalent SQL for every SQL-expressible
  * entry, with column aliases matched EXACTLY to the Spark output.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped grouped aggregation — partial aggs + tiny shuffle. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ VectorQueries.queries ++ PipelineQueries.queries ++
      ConnectorQueries.queries ++ AdvancedQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ VectorQueries.oracleSql ++ PipelineQueries.oracleSql ++
      ConnectorQueries.oracleSql ++ AdvancedQueries.oracleSql
}
