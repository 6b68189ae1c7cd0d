package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incrementally-maintained aggregates (materialized-view maintenance).
  *
  * At 100 TB the standing corpus is never re-aggregated per batch: the
  * rollup lives as a STATE table of mergeable statistics, and each
  * arriving batch contributes a batch-sized delta that merges in state ∪
  * delta time — the full history is touched exactly once, ever. The
  * statistics here (count, exact-decimal sum, min, max) are chosen
  * associative+commutative so merge order and batch boundaries cannot
  * change the result ([[merge]](…[[merge]](s, d₁)…, dₙ) ≡ one global
  * aggregation — the m27 gate proves it against a full-recompute oracle).
  * The same algebra is why Spark's own partial aggregation works; this
  * operator lifts it across BATCHES instead of partitions. Average and
  * friends derive from (sum, n) at read time; non-decomposable stats
  * (exact median) need the sketch path (q18) instead.
  *
  * The sum is carried as DECIMAL(38,2) — exact at any merge depth, and a
  * fixed type so state written in round N unions cleanly with deltas
  * written in round N+1 (Spark would otherwise widen the precision per
  * merge and drift the state schema).
  */
object IncrementalAgg {

  private val SumType = DecimalType(38, 2)

  /** Aggregate one batch into state rows: (keys…, n, sum_dec, min_v,
    * max_v). One partial-aggregated shuffle of the batch only. */
  def delta(batch: DataFrame, keys: Seq[String], value: Column): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(value.cast(DecimalType(18, 2))).cast(SumType).as("sum_dec"),
        min(value).as("min_v"), max(value).as("max_v"))

  /** Merge two state tables (state ∪ delta → state). Cost is bounded by
    * the GROUP cardinality, never the row history. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_dec")).cast(SumType).as("sum_dec"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))

  // ---- streaming maintenance --------------------------------------------
  //
  // foreachBatch gives at-least-once batch delivery: after a crash the
  // checkpoint REPLAYS the last batch, and a bare merge would double-count
  // it. State therefore lives as generation directories plus commit
  // markers (the StreamIngest idiom): gen-<batchId>/ is written first
  // (overwrite-idempotent), the marker is created only after the write
  // completes, and readers resolve the highest MARKED generation. Every
  // crash window replays into a rewrite or a skip — never a double merge.

  private def commitsDir(statePath: String) =
    java.nio.file.Paths.get(statePath, "_commits")

  private def committedGens(statePath: String): Seq[Long] = {
    val d = commitsDir(statePath)
    if (!java.nio.file.Files.isDirectory(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString.toLong).toSeq.sorted
      finally s.close()
    }
  }

  /** The current maintained state (empty-schema error if never run). */
  def readState(spark: org.apache.spark.sql.SparkSession,
                statePath: String): DataFrame = {
    val gens = committedGens(statePath)
    require(gens.nonEmpty, s"no committed state under $statePath")
    spark.read.parquet(s"$statePath/gen-${gens.last}")
  }

  /** Apply one micro-batch to the state — the foreachBatch body, public
    * so tests can drive replay/crash scenarios directly. Skips batches
    * whose marker already exists (checkpoint replay after a successful
    * commit); rewrites the generation wholesale otherwise (replay after
    * a crash mid-write lands on `overwrite`). Keeps the previous
    * generation for in-flight readers, prunes everything older. */
  def maintainBatch(statePath: String, keys: Seq[String], value: Column)
                   (batch: DataFrame, batchId: Long): Unit = {
    import java.nio.file.Files
    val marker = commitsDir(statePath).resolve(batchId.toString)
    if (Files.exists(marker)) return
    val prev = committedGens(statePath).filter(_ < batchId)
    val d = delta(batch, keys, value)
    val merged = prev.lastOption match {
      case Some(g) => merge(
        batch.sparkSession.read.parquet(s"$statePath/gen-$g"), d, keys)
      case None => d
    }
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$statePath/gen-$batchId")
    Files.createDirectories(commitsDir(statePath))
    Files.createFile(marker)
    prev.dropRight(1).foreach { g =>
      deleteTree(java.nio.file.Paths.get(s"$statePath/gen-$g"))
      Files.deleteIfExists(commitsDir(statePath).resolve(g.toString))
    }
  }

  private def deleteTree(root: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(root)) return
    val walk = java.nio.file.Files.walk(root)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
  }

  /** Wire [[maintainBatch]] under a streaming source: the continuously-
    * maintained rollup (m28 runs it AvailableNow over the file stream;
    * production leaves it running against the live ingest). */
  def maintain(src: DataFrame, keys: Seq[String], value: Column,
               statePath: String, checkpoint: String,
               trigger: org.apache.spark.sql.streaming.Trigger)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // explicit Scala function value: dodges the Scala/Java foreachBatch
    // overload ambiguity (the StreamIngest idiom)
    val fn: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (b, id) => maintainBatch(statePath, keys, value)(b.toDF(), id)
    src.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch(fn)
      .start()
  }
}
