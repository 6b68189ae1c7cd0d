package graft.operators

import org.apache.spark.sql.DataFrame

/** Generation-directory state with commit markers — the shared persistence
  * protocol under the incrementally-maintained operators ([[IncrementalAgg]]
  * rollups, [[KeyedUpsert]] CDC tables).
  *
  * foreachBatch gives at-least-once batch delivery: after a crash the
  * checkpoint REPLAYS the last batch, and a bare state update would apply
  * it twice. State therefore lives as `gen-<batchId>/` directories plus
  * commit markers (the StreamIngest idiom): the generation is written
  * first (overwrite-idempotent), the marker is created only after the
  * write completes, and readers resolve the highest MARKED generation.
  * Every crash window replays into a rewrite or a skip — never a double
  * apply. The previous generation survives one commit for in-flight
  * readers; everything older is pruned.
  */
private[graft] object GenState {

  /** In-memory pass-forward of the last committed state per statePath:
    * each micro-batch otherwise pays a parquet listing + footer + scan to
    * re-read what THIS process wrote moments ago (at gate scale that
    * read-back is a visible slice of every batch's wall). Entries are
    * only ever a plan that is already MATERIALIZED (a localCheckpoint —
    * LogicalRDD root), so reuse costs no recompute and chains no lineage
    * across batches; producers whose state is a live plan simply skip the
    * cache. Keyed by (statePath, generation): a replay, another writer,
    * or a fresh JVM misses and falls back to the parquet read — the
    * crash-recovery contract is untouched, this is purely a fast path.
    * LRU-capped so long sessions hold a handful of small state frames. */
  private val MaxCachedStates = 8
  private val lastState =
    new java.util.LinkedHashMap[String, (Long, DataFrame)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, DataFrame)]): Boolean =
        size > MaxCachedStates
    }
  private def cachedState(statePath: String, gen: Long): Option[DataFrame] =
    lastState.synchronized(Option(lastState.get(statePath)))
      .filter(_._1 == gen).map(_._2)

  private def commitsDir(statePath: String) =
    java.nio.file.Paths.get(statePath, "_commits")

  def committedGens(statePath: String): Seq[Long] = {
    val d = commitsDir(statePath)
    if (!java.nio.file.Files.isDirectory(d)) Seq.empty
    else {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString.toLong).toSeq.sorted
      finally s.close()
    }
  }

  /** The current committed state (error if no batch ever committed). */
  def readState(spark: org.apache.spark.sql.SparkSession,
                statePath: String): DataFrame = {
    val gens = committedGens(statePath)
    require(gens.nonEmpty, s"no committed state under $statePath")
    cachedState(statePath, gens.last)
      .getOrElse(spark.read.parquet(s"$statePath/gen-${gens.last}"))
  }

  /** Apply one micro-batch: `next(previousStateOrNone)` produces the new
    * state frame, which is written as gen-`batchId` and marked. Skips
    * batches whose marker already exists (replay after a successful
    * commit); rewrites the generation wholesale otherwise (replay after a
    * crash mid-write lands on `overwrite`). */
  def applyBatch(spark: org.apache.spark.sql.SparkSession, statePath: String,
                 batchId: Long)(next: Option[DataFrame] => DataFrame): Unit = {
    import java.nio.file.Files
    val marker = commitsDir(statePath).resolve(batchId.toString)
    if (Files.exists(marker)) return
    val prev = committedGens(statePath).filter(_ < batchId)
    val merged = next(prev.lastOption.map(g =>
      cachedState(statePath, g)
        .getOrElse(spark.read.parquet(s"$statePath/gen-$g"))))
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$statePath/gen-$batchId")
    Files.createDirectories(commitsDir(statePath))
    Files.createFile(marker)
    // pass the state forward in memory ONLY when it is already
    // materialized — a localCheckpoint (LogicalRDD) or driver-built rows
    // (LocalRelation, the size-gated operators' output). Caching a live
    // plan would silently chain lineage across every batch of a
    // long-running stream.
    val materialized = merged.queryExecution.logical match {
      case _: org.apache.spark.sql.execution.LogicalRDD => true
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
      case _ => false
    }
    if (materialized)
      lastState.synchronized(lastState.put(statePath, (batchId, merged)): Unit)
    else
      lastState.synchronized(lastState.remove(statePath): Unit)
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
}
