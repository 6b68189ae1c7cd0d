// Minimal STOCK-SPARK repro for the m31 fence (BENCH_SCALE / VERDICT r15
// #4, stretch #7): a watermarked streaming full-outer join on the RocksDB
// state store provider evicts state (numRowsTotal steps down across
// batches) while reporting numRowsRemoved = 0 in every stateOperators
// progress row; the default HDFS-backed provider reports the removals.
// No graft classes involved — run with a bare spark-shell:
//
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --conf spark.ui.enabled=false -I tools/repro_m31_rows_removed.scala
//
// Output: one PROVIDER=… line per provider with the observed eviction
// (max step-down of numRowsTotal) and the summed numRowsRemoved, then a
// VERDICT line naming which providers under-report.

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

def run(provider: String): (Long, Long) = {
  val s = spark.newSession()
  s.conf.set("spark.sql.shuffle.partitions", "4")
  s.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
  val ckpt = java.nio.file.Files.createTempDirectory("m31repro").toString
  // two watermarked streams off one rate source; a ±1 s join window so
  // rows age out of state a couple of batches after arrival
  val rate = s.readStream.format("rate")
    .option("rowsPerSecond", "500").load()
  val left = rate.select(col("timestamp").as("lts"),
    (col("value") % 97).as("lk")).withWatermark("lts", "2 seconds")
  val right = rate.select(col("timestamp").as("rts"),
    (col("value") % 101).as("rk")).withWatermark("rts", "2 seconds")
  val joined = left.join(right,
    expr("lk = rk AND rts BETWEEN lts - interval 1 second AND lts + interval 1 second"),
    "full_outer")
  val q = joined.writeStream.format("noop")
    .option("checkpointLocation", ckpt)
    .trigger(Trigger.ProcessingTime("1 second")).start()
  // wait on BATCHES, not wall time — eviction needs the watermark to
  // advance across several completed micro-batches, and batch cadence
  // varies with host load
  val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
  while (q.recentProgress.count(_.numInputRows > 0) < 12 &&
      System.nanoTime() < deadline) Thread.sleep(500)
  q.stop(); q.awaitTermination()
  val ops = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
  val totals = ops.map(_.numRowsTotal)
  // eviction evidence: the largest single-step DECREASE in state rows
  val evicted = totals.sliding(2).collect {
    case Seq(a, b) if b < a => a - b }.foldLeft(0L)(math.max)
  val removed = ops.map(_.numRowsRemoved).sum
  println(s"PROVIDER=${provider.split('.').last} batches=${totals.size} " +
    s"maxRowsTotal=${if (totals.isEmpty) 0 else totals.max} " +
    s"maxStepDown=$evicted sumRowsRemoved=$removed")
  (evicted, removed)
}

val hdfs = run("org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
val rocks = run("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

val underreports = Seq(
  ("HDFSBackedStateStoreProvider", hdfs),
  ("RocksDBStateStoreProvider", rocks)).collect {
  case (name, (evicted, removed)) if evicted > 0 && removed == 0 => name }
println(if (underreports.nonEmpty)
    s"VERDICT: numRowsRemoved under-reported by: ${underreports.mkString(", ")}"
  else "VERDICT: no under-report observed (both providers account evictions)")
System.exit(0)
