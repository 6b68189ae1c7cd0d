package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** The round-6 regression, institutionalized: the driver testdata has
  * shipped `events.ts` as BOTH Parquet TIMESTAMP(NANOS) (readable only as
  * BIGINT nanos under `nanosAsLong`) and TIMESTAMP(MICROS) (a native
  * timestamp). [[Tables.events]] / [[Tables.eventsStream]] must normalize
  * either encoding to the same microsecond TIMESTAMP — a loader that
  * assumes one physical encoding breaks every downstream events query the
  * day the file is regenerated. */
class TablesSpec extends SparkSpec {

  private val tUs = 1704067200123456L // 2024-01-01T00:00:00.123456Z in µs

  private def writeEvents(dir: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = dir + "/.tmp"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/events.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  test("events loader: BIGINT-nanos and TIMESTAMP encodings normalize identically") {
    import spark.implicits._

    // encoding A: ts as raw nanosecond longs (what TIMESTAMP(NANOS)
    // arrives as under nanosAsLong)
    val nsDir = Files.createTempDirectory("graft_ev_ns").toString
    writeEvents(nsDir, Seq((1L, tUs * 1000L, 7L, "click", 1.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value"))

    // encoding B: ts as a native microsecond TIMESTAMP
    val usDir = Files.createTempDirectory("graft_ev_us").toString
    writeEvents(usDir, Seq((1L, new Timestamp(tUs / 1000), 7L, "click", 1.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(lit(tUs))))

    for (dir <- Seq(nsDir, usDir)) {
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType,
        s"$dir: ts must normalize to TIMESTAMP, got ${ev.schema("ts").dataType}")
      val got = ev.select(unix_micros(col("ts"))).head().getLong(0)
      assert(got == tUs, s"$dir: expected $tUs µs, got $got")
    }

    // streaming face agrees with the batch face on both encodings
    streamingFaceCheck(Seq(nsDir, usDir))
  }

  test("lineitem/orders loaders: DATE and BIGINT-nanos date columns normalize to TIMESTAMP") {
    import spark.implicits._
    // the same silent-regeneration scenario for the TPC-H time columns:
    // today's files ship TIMESTAMP(MICROS); a DATE or nanos-as-BIGINT
    // drop must degrade to a cast in Tables, not to red queries
    val midnightUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val asDate = Files.createTempDirectory("graft_li_date").toString
    Seq((1L, java.sql.Date.valueOf("2024-01-01")))
      .toDF("l_orderkey", "l_shipdate")
      .write.parquet(s"$asDate/lineitem.parquet")
    val asNs = Files.createTempDirectory("graft_ord_ns").toString
    Seq((1L, midnightUs * 1000L)).toDF("o_orderkey", "o_orderdate")
      .write.parquet(s"$asNs/orders.parquet")
    val li = Tables.lineitem(spark, asDate)
    assert(li.schema("l_shipdate").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(li.select(unix_micros(col("l_shipdate"))).head().getLong(0)
      == midnightUs)
    val ord = Tables.orders(spark, asNs)
    assert(ord.schema("o_orderdate").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(ord.select(unix_micros(col("o_orderdate"))).head().getLong(0)
      == midnightUs)
    // the STREAMING face normalizes identically (a batch/stream split on
    // the encoding decision is exactly the divergence class this guards)
    val sname = s"tables_spec_li_${asDate.hashCode.abs}"
    val q = Tables.stream(spark, asDate, "lineitem")
      .select(unix_micros(col("l_shipdate")).as("us"))
      .writeStream.format("memory").queryName(sname).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table(sname).head().getLong(0) == midnightUs,
      "stream face disagrees with the batch face on a DATE-encoded drop")
  }

  test("BIGINT time columns outside the ns epoch range fail loudly, not 1000x mis-scaled") {
    import spark.implicits._
    // a regenerated drop that encodes MICROS as BIGINT: the same instant
    // is ~10^3 below the ns-range floor — the loader must raise, because
    // silently treating it as ns would shift every event to 1970
    val usAsLong = Files.createTempDirectory("graft_ev_uslong").toString
    writeEvents(usAsLong, Seq((1L, tUs, 7L, "click", 1.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    val ex = intercept[Exception] {
      Tables.events(spark, usAsLong).select("ts").collect()
    }
    def rootMsgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ rootMsgs(e.getCause))
    assert(rootMsgs(ex).exists(_.contains("nanosecond epoch range")),
      s"expected the ns-contract error, got: ${rootMsgs(ex).mkString(" | ")}")
  }

  private def streamingFaceCheck(dirs: Seq[String]): Unit = {
    for (dir <- dirs) {
      val src = Tables.eventsStream(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("us"))
      val qn = s"tables_spec_${dir.hashCode.abs}"
      val q = src.writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(spark.table(qn).head().getLong(1) == tUs,
        s"$dir: streaming face disagrees with batch")
    }
  }
}
