package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each module contributes operator queries (SURVEY §2 coverage) and, where
  * ANSI-SQL-expressible, a DuckDB oracle the driver hash-compares against.
  * Query and oracle output columns are name-aligned by construction.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, QUtil.QFn], Map[String, String])] = Seq(
    (CoreQueries.queries, CoreQueries.oracles),
    (AnalyticsQueries.queries, AnalyticsQueries.oracles),
    (TimeSeriesQueries.queries, TimeSeriesQueries.oracles),
    (EngineQueries.queries, EngineQueries.oracles),
    (graft.llm.LlmQueries.queries, graft.llm.LlmQueries.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.queries("q3_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
