package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {

  test("zValue16: hand-checked Morton vectors, including the 16-bit extremes") {
    import spark.implicits._
    val z = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (0xFFFFL, 0L),
        (0L, 0xFFFFL), (0xFFFFL, 0xFFFFL))
      .toDF("a", "b")
      .select(ZOrder.zValue16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,5): a=011 on even bits, b=101 on odd → 100111b = 39
    assert(z == Seq(0L, 1L, 2L, 39L, 0x55555555L, 0xAAAAAAAAL, 0xFFFFFFFFL))
  }

  test("clusterWrite: a predicate on EITHER dimension skips files; a linear layout cannot") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // quantize hours (0..719) to a 4-bit grid so the two dims interleave
    // with balanced weight — the caller-side step the operator documents
    val ev = Tables.events(spark, sf())
      .withColumn("h16",
        expr("((unix_timestamp(ts) - 1704067200L) div 3600) div 48"))
    ZOrder.clusterWrite(ev, col("user_id"), col("h16"), 8, s"$dir/z")
    // the status-quo layout: time-sorted (what ingest order gives you)
    ev.repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$dir/linear")

    // real per-file stats, as a min/max-pruning reader would see them
    def fileRanges(path: String): Seq[(Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val r = spark.read.parquet(f.getPath)
            .agg(min("user_id"), max("user_id")).head()
          (r.getLong(0), r.getLong(1))
        }
    def hitting(ranges: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      ranges.count { case (mn, mx) => mx >= lo && mn <= hi }

    val zr = fileRanges(s"$dir/z")
    val lr = fileRanges(s"$dir/linear")
    // users are uniform over time, so EVERY time-sorted file spans them all
    assert(hitting(lr, 0, 3) == lr.size,
      s"linear layout unexpectedly clustered users: $lr")
    // z-order fixes the user dimension's high bit per z-range: a narrow
    // user predicate must skip at least a quarter of the files
    assert(hitting(zr, 0, 3) <= zr.size - zr.size / 4,
      s"z-order layout did not tighten user_id file stats: $zr")
  }
}
