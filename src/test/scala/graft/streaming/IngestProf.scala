package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.UnitDb

/** Scratch profiler for the ingest path (test scope, manual runMain). */
object IngestProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val rep = args.headOption.map(_.toInt).getOrElse(7)
    val base = java.nio.file.Files.createTempDirectory("graft_ing").toString
    val db = UnitDb.open(spark, base + "/store")
    // schema-adaptive loader — ts arrives as a canonical µs TIMESTAMP
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.1")
    val big = ev.crossJoin(spark.range(rep).toDF("rep"))
      .select(concat(col("event_type"), lit(".u"),
        ((col("user_id") * 7 + col("rep")) % 200).cast("string"),
        lit(".d"), (col("event_id") % 50).cast("string")).as("topic"),
        col("props").cast("binary").as("payload"),
        col("ts")).cache()
    println("ROWS " + big.count())
    val parsed = StreamIngest.toParsed(db, big, 0L)
    time("PARSE_W")(parsed.write.format("noop").mode("overwrite").save())
    time("PARSE")(parsed.write.format("noop").mode("overwrite").save())
    val msgs = parsed.filter(col("msg").isNotNull).select("msg.*")
    time("WRITE")(db.appendFrame(msgs))
    spark.stop()
  }
}
