package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.UnitDb
import graft.model.{Message, Topic}

/** S1 PUBLISH — streaming ingest into a [[UnitDb]] store (reference
  * server PUBLISH path, server/internal/hdl_conn.go:434-477: persist via
  * `store.Message.Put`, then fan out — fan-out is [[Subscribe]]).
  *
  * Spark-first shape: any streaming DataFrame (socket/file/Kafka/memory
  * source) with `topic STRING, payload BINARY` columns (optional `ts`,
  * `contract`, `ttl_ms`, `encrypt`) is appended to the store via
  * `foreachBatch`, with topic parsing, seq assignment, partition
  * derivation, encryption and bloom config all running distributively —
  * no driver-side row loop, so a 1000-executor cluster ingests at scan
  * speed.
  *
  * Exactly-once: Structured Streaming checkpointing replays the last
  * un-committed batch after a crash/restart; a per-query commit-marker
  * sidecar (`_ingest_commits/<query>/<batchId>`, invisible to readers via
  * the `_` prefix) makes the replayed `foreachBatch` a no-op, the same
  * idempotent-sink contract the reference gets from WAL seq-dedup on
  * recovery (memdb/recovery.go:81-215). The marker is written after the
  * Parquet commit; a crash between the two replays the batch — the
  * at-least-once window every non-transactional file sink has.
  */
/** Normalized ingest row (pre-parse). Public because Catalyst's generated
  * deserializer instantiates it from codegen'd Java. */
final case class IngestRow(
    topic: String,
    payload: Array[Byte],
    ts: Timestamp,
    contract: Long,
    ttl_ms: Option[Long],
    encrypt: Boolean,
    _mid: Long)

/** Parse outcome: exactly one of `msg` / `reject` is set; `_mid` is the
  * row's `monotonically_increasing_id` (partitionId«33 | row-in-partition),
  * kept so the final seq can be assigned *after* parsing from a reserved
  * contiguous range. A malformed topic in a 100 TB ingest must dead-letter
  * one row, not abort the query (the reference rejects a bad PUBLISH
  * per-message on the connection, hdl_conn.go:434-477 — the pipeline
  * analogue is a rejects sidecar). */
final case class ParsedRow(msg: Option[Message], reject: Option[RejectRow], _mid: Long)

/** A dead-lettered input row: the raw topic, the reason, and enough
  * context to replay it after fixing. */
final case class RejectRow(
    topic: String,
    reason: String,
    ts: Timestamp,
    contract: Long,
    payload: Array[Byte])

object StreamIngest {

  /** Upper bound on dead-letter writer tasks: keeps the file count of the
    * (usually tiny) `_rejects` sidecar bounded without serializing a
    * poisoned batch through one task. */
  val MaxRejectWriteTasks = 32

  /** Start the ingest query. `stream` must be a *streaming* DataFrame with
    * at least (topic, payload). Checkpoint + commit markers give restart
    * safety; see class doc. */
  def start(
      db: UnitDb,
      stream: DataFrame,
      checkpointDir: String,
      queryName: String = "graft_ingest",
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (batch, batchId) => appendBatch(db, batch.toDF(), batchId, queryName)
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(fn)
      .start()
  }

  /** [[start]] plus periodic small-file maintenance: every `compactEvery`
    * micro-batches, the store's hot partitions are folded by
    * [[UnitDb.compact]] — the continuous-crawl ingest loop that would
    * otherwise accrete one file per partition per batch forever runs its
    * own bounded-file-count upkeep, exactly the way a long-lived 100 TB
    * ingest must (compaction cost stays proportional to the freshly
    * written partitions). Runs on the driver between batches, under the
    * store's writer lock like every other write. A checkpoint replay that
    * re-fires the maintenance batch is harmless: compaction is idempotent
    * (a folded partition is below `minFiles` and is skipped). */
  def startWithMaintenance(
      db: UnitDb,
      stream: DataFrame,
      checkpointDir: String,
      queryName: String = "graft_ingest",
      trigger: Trigger = Trigger.ProcessingTime(0L),
      compactEvery: Int = 16,
      compactMinFiles: Int = 8): StreamingQuery = {
    require(compactEvery >= 1, s"compactEvery must be >= 1, got $compactEvery")
    // fail at start(), not at the first maintenance batch deep into the run
    require(compactMinFiles >= 2,
      s"compactMinFiles must be >= 2, got $compactMinFiles")
    val fn: (Dataset[Row], Long) => Unit = (batch, batchId) => {
      appendBatch(db, batch.toDF(), batchId, queryName)
      if (batchId > 0 && batchId % compactEvery == 0)
        db.compact(compactMinFiles): Unit
    }
    stream.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(fn)
      .start()
  }

  /** Idempotently append one micro-batch: skipped entirely when its commit
    * marker exists (checkpoint replay after restart). Rows whose topic
    * fails to parse are appended to the `_rejects/<query>` dead-letter
    * sidecar instead of failing the query. Public so tests and custom
    * sinks can drive it directly.
    *
    * Seq assignment: one small aggregation over the (persisted) parsed
    * batch yields per-partition row counts; a contiguous range of that
    * total is reserved from the store's seq counter
    * ([[UnitDb.reserveSeqRange]]) and each row gets
    * `base + partitionOffset + rowInPartition` via a broadcast join on a
    * partitions-sized offset table. Unlike the old bit-packed
    * `(batchId+1)<<40 | monotonically_increasing_id` scheme — which
    * collided across batches once a batch had ≥ 128 partitions, because
    * the partition id lives in bits 33+ of the mid — this is collision
    * free at ANY partition count, and also never collides with driver-side
    * API puts (same counter). Rejected rows burn their reserved seqs,
    * leaving gaps; gaps are harmless — uniqueness, not density, is the
    * contract. The counts pass reads only the persisted parsed batch, not
    * the source.
    *
    * Determinism assumption (ADVICE r3): the counts job and the append job
    * both read the persisted parsed frame; if a cached block is evicted it
    * is recomputed from the source, so `_mid` (and with it the per-
    * partition counts) must reproduce — which holds exactly when the
    * micro-batch source is replayable-deterministic, the SAME assumption
    * the commit-marker idempotence (and every exactly-once foreachBatch
    * sink) already stands on. It is nevertheless *verified* per batch: an
    * `observe` on the append asserts the assigned seqs stay inside the
    * reserved range and the accepted row count matches the counts pass —
    * a desynced recompute fails the batch loudly instead of silently
    * writing duplicate seqs (the metric rides on the write job; no extra
    * pass). */
  def appendBatch(db: UnitDb, batch: DataFrame, batchId: Long, queryName: String): Unit = {
    val commitDir = Paths.get(db.path, "_ingest_commits", queryName)
    val marker = commitDir.resolve(f"$batchId%020d")
    if (Files.exists(marker)) return // replayed batch — already committed
    def writeMarker(): Unit = db.withWriterLock {
      Files.createDirectories(commitDir)
      Files.createFile(marker): Unit
    }
    val parsed = toParsed(db, batch, batchId)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one job: per-partition counts (for contiguous offsets) + accepted
      // row/byte totals (for truthful varz metrics, r2 VERDICT O17)
      val stats = parsed.toDF()
        .groupBy(shiftright(col("_mid"), 33).as("pid"))
        .agg(count(lit(1)).as("n"), count(col("msg")).as("n_msg"),
          coalesce(sum(octet_length(col("msg.payload"))), lit(0L)).as("bytes"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      val total = stats.map(_._2).sum
      if (total > 0) {
        val base = db.reserveSeqRange(total)
        var acc = 0L
        val offsets = stats.map { case (pid, n, _, _) => val o = acc; acc += n; (pid, o) }
        val offDf = broadcast(
          db.spark.createDataFrame(offsets.toSeq).toDF("pid", "off"))
        val withSeq = parsed.toDF()
          .withColumn("pid", shiftright(col("_mid"), 33))
          .join(offDf, Seq("pid"))
          .withColumn("seq",
            lit(base + 1) + col("off") + col("_mid").bitwiseAND(lit((1L << 33) - 1)))
        val nMsgs = stats.map(_._3).sum
        if (nMsgs > 0) {
          val obs = org.apache.spark.sql.Observation(
            s"graft_seq_span_${queryName}_$batchId")
          db.appendFrame(
            withSeq.filter(col("msg").isNotNull)
              .observe(obs, count(lit(1)).as("n"),
                min("seq").as("lo"), max("seq").as("hi"))
              .select(col("seq") +: Message.columnsAfterSeq.map(c => col(s"msg.$c")): _*))
          val m = obs.get
          val (n, lo, hi) = (m("n").asInstanceOf[Long],
            m("lo").asInstanceOf[Long], m("hi").asInstanceOf[Long])
          if (n != nMsgs || lo < base + 1 || hi > base + total) {
            // the bad rows are already durably appended — mark the batch
            // committed FIRST, or every restart would replay it and append
            // a full second copy on top of the desynced one; the exception
            // then stops the query with the span to reconcile by
            writeMarker()
            throw new IllegalStateException(
              s"seq assignment desynced from the counts pass (batch $batchId: " +
              s"wrote $n/$nMsgs rows, seq span [$lo,$hi] vs reserved " +
              s"[${base + 1},${base + total}]) — the micro-batch source " +
              "re-evaluated nondeterministically; batch is marked committed " +
              "to prevent duplicate replay; see appendBatch doc")
          }
        }
        db.recordBulkAppend(nMsgs, stats.map(_._4).sum)
        // the stats agg already knows the reject count — no isEmpty job.
        // coalesce (not repartition(1), r3 VERDICT #3): rejects are
        // usually rare — a few files is fine — but the failure mode
        // dead-lettering exists for is schema drift poisoning a WHOLE
        // batch, and that must write with distributed parallelism, not
        // funnel terabytes through one task
        if (total > nMsgs)
          // under the writer lock: a dead-letter file racing vacuum's
          // sidecar copy-then-swap would be deleted with the old
          // directory (ADVICE r3)
          db.withWriterLock {
            withSeq.filter(col("reject").isNotNull).select("reject.*")
              .coalesce(MaxRejectWriteTasks).write.mode("append")
              .option("compression", "snappy")
              .parquet(Paths.get(db.path, "_rejects", queryName).toString)
          }
      }
    } finally parsed.unpersist(): Unit
    // marker write runs under the writer lock (see writeMarker) — losing
    // one to a concurrent vacuum re-opens the duplicate-replay window it
    // exists to close
    writeMarker()
  }

  /** Observability hook (SURVEY §1.4: reference Varz → engine listener):
    * folds Structured Streaming progress events into per-query-name input
    * row counters. Attach with `spark.streams.addListener(l)`; read with
    * [[IngestProgressListener.rowsFor]]. Complements the store-level
    * [[UnitDb.varz]] counters (which count *accepted* rows at append
    * time) with the engine's own view of rows entering each query. */
  final class IngestProgressListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val rows = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def rowsFor(queryName: String): Long = rows.getOrDefault(queryName, 0L)
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val name = e.progress.name
      if (name != null)
        rows.merge(name, e.progress.numInputRows, (a, b) => a + b): Unit
    }
  }

  /** Dead-lettered rows for a query (empty frame if none). */
  def rejects(db: UnitDb, queryName: String): DataFrame = {
    val p = Paths.get(db.path, "_rejects", queryName)
    val spark = db.spark
    if (Files.exists(p)) spark.read.parquet(p.toString)
    else spark.emptyDataFrame
  }

  /** Distributed publish transform: normalize optional columns, then parse
    * each topic into its Message form on the executors — a failed parse
    * becomes a [[RejectRow]], never an exception. The Message carries a
    * placeholder seq of 0; [[appendBatch]] assigns the real seq from a
    * reserved contiguous range after the batch size is known (see its doc
    * for why — the old per-batch bit-packed scheme collided at ≥ 128
    * partitions). `_mid` is retained per row for the offset arithmetic. */
  private[streaming] def toParsed(db: UnitDb, batch: DataFrame, batchId: Long): Dataset[ParsedRow] = {
    val cols = batch.columns.toSet
    require(cols("topic") && cols("payload"),
      s"ingest stream needs (topic, payload); got ${batch.columns.mkString(",")}")
    // S5 secure mode: each row's topic must carry a write-authorizing
    // key prefix (reference hdl_conn.go:489-507 rejects an unauthorized
    // PUBLISH per message); an unauthorized row dead-letters below like
    // any malformed topic. Validation is pure arithmetic on the closure-
    // captured flag — no driver round-trip, no state, scan-speed safe.
    val secure = db.secureMode
    var df = batch
    if (!cols("ts")) df = df.withColumn("ts", lit(new Timestamp(db.nowMs())))
    if (!cols("contract")) df = df.withColumn("contract", lit(Message.MasterContract))
    if (!cols("ttl_ms")) df = df.withColumn("ttl_ms", lit(null).cast("long"))
    if (!cols("encrypt")) df = df.withColumn("encrypt", lit(false))
    df.withColumn("_mid", monotonically_increasing_id())
      .select(col("topic").cast("string"), col("payload"),
        col("ts").cast("timestamp"), col("contract").cast("long"),
        col("ttl_ms").cast("long"), col("encrypt").cast("boolean"), col("_mid"))
      .as(Encoders.product[IngestRow])
      .map { r =>
        try {
          val bare =
            if (!secure) r.topic
            else {
              val (key, b) = graft.model.TopicKey.split(r.topic)
              if (!graft.model.TopicKey.validate(key, b,
                  graft.model.TopicKey.AllowWrite, r.contract))
                throw new IllegalArgumentException(
                  s"unauthorized publish (no valid write key): ${r.topic}")
              b
            }
          val t = Topic.parse(bare)
          val ttl = r.ttl_ms.orElse(t.ttlMillis)
          ParsedRow(Some(Message(
            seq = 0L, // assigned in appendBatch from the reserved range
            contract = r.contract,
            topic = t.key,
            topic_parts = t.parts,
            is_wildcard = t.isWildcard,
            is_multi = t.multi,
            depth = t.depth,
            ts = r.ts,
            expires_at = ttl.map(ms => new Timestamp(r.ts.getTime + ms)),
            encrypted = r.encrypt,
            payload = r.payload)), None, r._mid)
        } catch {
          case e: IllegalArgumentException =>
            ParsedRow(None, Some(RejectRow(
              if (r.topic == null) "" else r.topic,
              e.getMessage, r.ts, r.contract, r.payload)), r._mid)
        }
      }(Encoders.product[ParsedRow])
  }
}
