package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (`TESTDATA.md`).
  *
  * `events.parquet` is written with Parquet TIMESTAMP(NANOS), which Spark
  * does not accept as a timestamp type (PARQUET_TYPE_ILLEGAL). We read it
  * with `spark.sql.legacy.parquet.nanosAsLong` and truncate to microsecond
  * timestamps — every derived computation then works on second-or-coarser
  * granularity so the DuckDB oracle (which keeps nanos) agrees.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** events with `ts` as a proper TIMESTAMP (nanos → micros, truncating). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
