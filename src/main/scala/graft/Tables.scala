package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Loaders for the driver testdata (`TESTDATA.md`).
  *
  * `events.parquet` has been observed under TWO physical encodings across
  * testdata generations:
  *
  *  - Parquet TIMESTAMP(NANOS), which Spark cannot read as a timestamp
  *    (PARQUET_TYPE_ILLEGAL) — readable only as BIGINT nanos under
  *    `spark.sql.legacy.parquet.nanosAsLong`;
  *  - Parquet TIMESTAMP(MICROS) without timezone, which Spark reads
  *    natively (TIMESTAMP_NTZ under the default NTZ inference).
  *
  * Nothing downstream may assume either: [[events]] inspects the file's
  * actual footer schema and normalizes `ts` to a microsecond-precision
  * TIMESTAMP in all cases (sessions run UTC, so the NTZ→TZ cast is a
  * bit-identity on the stored micros). [[eventsStream]] is the streaming
  * face with the same adaptivity — the file source needs an explicit
  * schema, which it takes from the batch footer read, so the two faces
  * can never disagree. All events reads MUST go through these two
  * loaders; `nanosAsLong` is owned here (set to the same constant before
  * every footer inspection — idempotent, so safe under concurrency) and
  * nowhere else.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Raw batch read of events with the legacy-nanos escape hatch on, so
    * BOTH encodings load (ns files arrive as BIGINT, µs files as a real
    * timestamp type). Single owner of the `nanosAsLong` conf. */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** Normalize whatever physical encoding a time column had to a
    * microsecond TIMESTAMP (truncating ns-as-BIGINT → µs; DATE /
    * TIMESTAMP_NTZ cast — a bit-identity in the UTC session; native
    * TIMESTAMP passes through). */
  private def canonTsCol(df: DataFrame, name: String): DataFrame =
    df.schema(name).dataType match {
      case LongType =>
        // ns-only contract, ENFORCED per row: a regenerated drop encoding
        // micros (or epoch days) as BIGINT must fail loudly, not load
        // 1000x mis-scaled. Plausible ns epoch range [1980, 2100) —
        // 315532800e9 .. 4102444800e9 ns; anything else (e.g. the same
        // instants in µs are ~10³ below the floor) raises at scan time.
        // One codegen'd comparison per row; raise_error sits on the cold
        // branch.
        df.withColumn(name, expr(
          s"""timestamp_micros(CASE
             |  WHEN $name IS NULL OR ($name >= 315532800000000000
             |                         AND $name < 4102444800000000000)
             |    THEN $name div 1000
             |  ELSE CAST(raise_error(concat(
             |    'canonTsCol($name): BIGINT value ', CAST($name AS STRING),
             |    ' is outside the nanosecond epoch range [1980,2100) — ',
             |    'the ns-only contract (Tables.timeCols) does not hold ',
             |    'for this file')) AS BIGINT)
             |END)""".stripMargin))
      case TimestampType => df
      case _ => df.withColumn(name, col(name).cast(TimestampType))
    }

  private def canonTs(df: DataFrame): DataFrame = canonTsCol(df, "ts")

  /** events with `ts` as a proper microsecond TIMESTAMP, whatever the
    * file's physical encoding. */
  def events(spark: SparkSession, dir: String): DataFrame =
    canonTs(eventsRaw(spark, dir))

  /** Streaming face of [[events]]: a file-source stream over the same
    * data with the same canonical `ts` TIMESTAMP column. The explicit
    * schema the file source requires is the batch footer schema, so the
    * physical-encoding decision is made in exactly one place. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val fileSchema = eventsRaw(spark, dir).schema
    canonTs(graft.queries.QUtil.streamTable(spark, fileSchema, dir, "events"))
  }

  /** Time columns that get encoding adaptivity per table (the r6 lesson
    * generalized): both the batch loaders below and [[stream]] normalize
    * these, so the two faces can never diverge on a regenerated drop. */
  private val timeCols: Map[String, String] =
    Map("lineitem" -> "l_shipdate", "orders" -> "o_orderdate")

  /** Streaming face of any non-events table, with the schema derived from
    * the file's own footer — never hand-declared (the r6 lesson: a
    * hard-coded physical schema breaks the day the testdata is
    * regenerated with a different encoding) — and the same time-column
    * normalization as the batch loaders. */
  def stream(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(name != "events", "events streams through eventsStream (ts canon)")
    val fileSchema = spark.read.parquet(s"$dir/$name.parquet").schema
    val src = graft.queries.QUtil.streamTable(spark, fileSchema, dir, name)
    timeCols.get(name).fold(src)(c => canonTsCol(src, c))
  }

  // the two TPC-H time columns get the same encoding adaptivity as
  // events.ts — today they ship TIMESTAMP(MICROS), but the r6 lesson is
  // that a silent testdata regeneration (DATE, or NANOS-as-BIGINT) must
  // degrade to a cast here, not to 40 red queries (see [[timeCols]])
  def lineitem(spark: SparkSession, dir: String): DataFrame =
    canonTsCol(table(spark, dir, "lineitem"), timeCols("lineitem"))
  def orders(spark: SparkSession, dir: String): DataFrame =
    canonTsCol(table(spark, dir, "orders"), timeCols("orders"))
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
