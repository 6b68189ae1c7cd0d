package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** ×N scale probe for the STREAMING STATE family (VERDICT r12 #2) — the
  * one heavy family the graph/dedup ×100 probes never touched: watermark
  * eviction state under stream-stream joins (m17/m21/m30/m31),
  * sessionization (m13/m40), streaming dedup (m14), and — since r14
  * (VERDICT r13 #3) — the arbitrary-keyed-state API (m18,
  * `flatMapGroupsWithState`), under the production RocksDB state-store
  * provider.
  *
  * Why a separate main instead of timing the registry queries on the
  * scale dir: the GATE queries bound their state on purpose
  * (`user_id < 30/40`) so the oracle output stays stable across scale
  * factors — but [[ScaleData]] shifts user ids per copy, so at ×100
  * those bounds select exactly the copy-0 users and the state machine
  * never feels the decade. This probe runs the SAME operator shapes
  * (same watermarks, same join intervals, same session gaps — the
  * registered queries' Scaladoc is the spec) UNBOUNDED, which is what a
  * production deployment of S2's per-client session tracking looks like.
  *
  * Probe shape:
  *  - events are re-laid-out as `Slices` time-contiguous single-file
  *    slices written in time order (modification-time order is what the
  *    file source replays), so `maxFilesPerTrigger=1` yields real
  *    micro-batches with a monotonically advancing watermark — each
  *    batch both GROWS state (new rows) and EVICTS it (watermark
  *    passing), the regime the gate's one-batch complete-mode runs
  *    never reach.
  *  - sinks are noop; nothing driver-side accumulates.
  *  - per-batch `StreamingQueryProgress.stateOperators` is harvested:
  *    peak/final state rows, total evictions, peak state-store bytes
  *    (RocksDB memory + SST where reported), and per-batch wall — the
  *    no-superlinear evidence is (a) ×100/×10 wall ratio ≈ data ratio,
  *    (b) peak state rows ≪ input rows (eviction works), (c) per-batch
  *    wall flat across batches (state cost amortized, not compounding).
  *
  * Eviction is ASSERTED, not just reported (VERDICT r13 #6): every probed
  * shape is watermark- or timeout-bounded, so a face whose state neither
  * ticks `numRowsRemoved` NOR shrinks between any pair of batches is a
  * broken eviction path — the probe fails loudly instead of recording a
  * number a reader must second-guess. The step-down arm exists because
  * RocksDB full-outer joins (m31) report `numRowsRemoved = 0` while
  * demonstrably evicting (upstream metrics accounting gap, BENCH_SCALE
  * §r13 note a); a future provider change that silently breaks eviction
  * now fails the probe instead of reading as "metrics gap". The gap is
  * PROVIDER-INDEPENDENT and reproduces against stock Spark 4.1.2 with
  * zero library code — `tools/repro_m31_rows_removed.scala` (bare
  * spark-shell, rate source, watermarked full-outer join) shows the
  * HDFS-backed provider stepping state down 1000 rows across batches
  * with `numRowsRemoved` stuck at 0, so the fence cites the operator's
  * metrics path, not the RocksDB provider.
  *
  * Usage: runMain graft.StreamScaleProbe <scaleDir> [queries...]
  * Output: one JSON line per query + a `probe_total` line (stdout), full
  * detail appended to stream_probe.json in the working directory (valid
  * JSONL — the scale dir travels as a `dir` field in every line; r13
  * wrote it as `#`-comment lines, which broke JSON parsers, ADVICE r13).
  */
object StreamScaleProbe {

  private val Slices = 16

  /** Machine-wide steal/busy seconds (USER_HZ jiffies → s), the Bench
    * telemetry pattern: each face's JSON line brackets its own window, so
    * a face that ran quiet is usable evidence even when a co-tenant storm
    * landed elsewhere in the run — the r13 ×100 leg had to annotate ALL
    * its walls as upper bounds because the probe couldn't say WHICH faces
    * the ~268 s of steal hit. */
  private def hostStat(): (Double, Double) = try {
    val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
      .trim.split("\\s+").drop(1).map(_.toDouble)
    val idle = f(3) + (if (f.length > 4) f(4) else 0.0)
    val steal = if (f.length > 7) f(7) else 0.0
    (steal / 100.0, (f.sum - idle) / 100.0)
  } catch { case _: Throwable => (-1.0, -1.0) }

  /** Typed probe row: the event-time column RIDES IN THE ROW (the
    * watermark attribute must survive into the typed plan — selecting it
    * away before the fold fails analysis for event-time timeouts). */
  case class ProbeEvent(user_id: Long, tsec: java.sql.Timestamp, v: BigDecimal)

  /** m18's arbitrary-keyed-state fold (per-user running profile in
    * `flatMapGroupsWithState` — `TimeSeriesQueries.userProfileStream` is
    * the registered shape), probed with EVENT-TIME TIMEOUT expiry: a
    * profile whose user goes quiet for 2 h past the watermark is emitted
    * once and its state REMOVED. The registered gate runs NoTimeout over
    * bounded keys (the oracle needs every profile in the output);
    * an unbounded production deployment of the same API bounds its state
    * exactly this way (the reference's TTL'd per-client sessions), and
    * the timeout leg is the one code path the bounded oracle can never
    * exercise. Same fold algebra (count/min/max/exact-decimal sum, all
    * commutative), same 4 h watermark as every other probed face. */
  private def profileWithExpiry(
      src: org.apache.spark.sql.Dataset[ProbeEvent])
      : org.apache.spark.sql.Dataset[graft.queries.TimeSeriesQueries.UserProfile] = {
    import graft.queries.TimeSeriesQueries.UserProfile
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    implicit val pEnc = Encoders.product[UserProfile]
    src.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[UserProfile, UserProfile](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            val fin = state.get
            state.remove()
            Iterator.single(fin)
          } else {
            // the SHARED gate algebra (TimeSeriesQueries.foldProfile) —
            // only the expiry policy differs from the registered m18
            val prev = state.getOption.getOrElse(
              graft.queries.TimeSeriesQueries.emptyProfile(user))
            val next = rows.foldLeft(prev)((acc, r) =>
              graft.queries.TimeSeriesQueries.foldProfile(
                acc, r.tsec.getTime / 1000L, r.v))
            state.update(next)
            // expire 2 h of event time after the user's last event; a
            // timeout timestamp must sit past the current watermark (the
            // engine rejects earlier ones), so clamp for groups whose
            // late-but-in-watermark rows trail it
            state.setTimeoutTimestamp(math.max(next.max_t * 1000L + 7200L * 1000L,
              state.getCurrentWatermarkMs + 1L))
            Iterator.empty
          }
      }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.benchdata/sf1")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the production provider — the probe's whole point is RocksDB
      // state behavior at corpus-scale keys
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- arrival-ordered slices -----------------------------------------
    // Checkpoints ALWAYS live in a fresh temp dir (a reused checkpoint
    // would resume mid-stream and silently skip batches); the slice
    // layout alone may be reused across attempts via
    // SPARK_GRAFT_PROBE_SLICES_DIR — at ×1000 the prep writes ~1.6 GB,
    // and its dirty-page flush bleeds host I/O pressure (read as steal
    // under this hypervisor) into the FIRST face's measurement window,
    // so an assembly hunt re-running a storm-hit face shouldn't re-pay
    // (or re-suffer) the layout.
    val base = java.nio.file.Files.createTempDirectory("graft_sprobe").toString
    val sliceBase = sys.env.getOrElse("SPARK_GRAFT_PROBE_SLICES_DIR", base)
    val doneMarker = java.nio.file.Paths.get(s"$sliceBase/ev_layout_done")
    // the marker carries WHAT was sliced (canonical source dir + the
    // events file's size and mtime — cheap, no Spark read), and reuse
    // REQUIRES it to match (ADVICE r15): a pinned SLICES_DIR surviving a
    // dataset switch or a .benchdata regeneration would otherwise
    // silently benchmark stale slices while the JSON rows record the new
    // `dir`, corrupting committed evidence. Old markers (r15 wrote an
    // empty file) fail the match too — better to re-lay once than trust
    // an unprovenanced layout.
    def sliceFingerprint(): String = {
      val ev = new java.io.File(s"$dir/events.parquet")
      s"""{"src":"${new java.io.File(dir).getCanonicalPath.replace("\"", "\\\"")}","bytes":${ev.length},"mtime":${ev.lastModified}}"""
    }
    if (java.nio.file.Files.exists(doneMarker)) {
      val recorded = new String(
        java.nio.file.Files.readAllBytes(doneMarker), "UTF-8").trim
      require(recorded == sliceFingerprint(),
        s"pinned slice layout at $sliceBase was built from a DIFFERENT " +
        s"dataset generation (marker: $recorded, current: " +
        s"${sliceFingerprint()}) — delete $sliceBase to re-lay")
      System.err.println(s"[probe] reusing slice layout at $sliceBase/ev")
    } else {
      // single-writer lock (ADVICE r15): two probes sharing a SLICES_DIR
      // could both pass the marker-absent check and clobber each other's
      // slice mtimes (the replay order). Files.createFile is atomic —
      // the loser fails loudly here instead of at the done-marker write.
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(sliceBase))
      try java.nio.file.Files.createFile(
        java.nio.file.Paths.get(s"$sliceBase/ev_layout_lock"))
      catch { case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"another probe is laying out slices under $sliceBase " +
          "(ev_layout_lock exists) — hunts sharing a SLICES_DIR must be " +
          "serialized; delete the lock only if that probe is dead")
      }
      // persisted: the 16 slice writes below must stay SEQUENTIAL (the
      // file source replays in modification-time order — one partitionBy
      // job would give every slice the same mtime), but they should filter
      // a cached frame, not re-scan the source parquet 16 times
      val ev = Tables.events(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bounds = ev.agg(min(unix_timestamp(col("ts"))),
        max(unix_timestamp(col("ts")))).head()
      require(!bounds.isNullAt(0) && !bounds.isNullAt(1),
        s"no events (or all-null ts) under $dir — nothing to probe")
      val (t0, t1) = (bounds.getLong(0), bounds.getLong(1) + 1)
      val width = math.max(1L, (t1 - t0) / Slices)
      val prep0 = System.nanoTime()
      (0 until Slices).foreach { i =>
        val lo = t0 + i * width
        val hi = if (i == Slices - 1) t1 else t0 + (i + 1) * width
        ev.filter(unix_timestamp(col("ts")) >= lo &&
            unix_timestamp(col("ts")) < hi)
          .coalesce(1).write.mode("overwrite").parquet(f"$sliceBase/ev/s$i%02d")
      }
      ev.unpersist()
      java.nio.file.Files.write(doneMarker,
        sliceFingerprint().getBytes("UTF-8")): Unit
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$sliceBase/ev_layout_lock")): Unit
      System.err.println(f"[probe] slice prep ${(System.nanoTime() - prep0) / 1e9}%.1f s → $sliceBase")
    }
    val evSchema = spark.read.parquet(s"$sliceBase/ev/s00").schema
    def evStream = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$sliceBase/ev/*")
      .withColumn("tsec", timestamp_seconds(unix_timestamp(col("ts"))))

    // ---- the probed shapes (gate Scaladocs are the spec) ----------------
    def clicks = evStream.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("tsec").as("c_tsec"))
      .withWatermark("c_tsec", "4 hours")
    def purchases = evStream.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("tsec").as("p_tsec"),
        col("value").as("purchase_value"))
      .withWatermark("p_tsec", "4 hours")
    def intervalJoin(kind: String) = clicks.join(purchases,
      col("user_id") === col("p_user") &&
      col("p_tsec") >= col("c_tsec") - expr("INTERVAL 2 HOURS") &&
      col("p_tsec") <= col("c_tsec"), kind)

    val shapes: Seq[(String, () => DataFrame)] = Seq(
      "m13_session" -> (() => evStream
        .withWatermark("tsec", "4 hours")
        .groupBy(session_window(col("tsec"), "30 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))),
      "m40_dyn_session" -> (() => evStream
        .withWatermark("tsec", "4 hours")
        .groupBy(session_window(col("tsec"),
          when(col("event_type") === "purchase", "60 minutes")
            .otherwise("30 minutes")).as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))),
      // m14's state machine (dropDuplicatesWithinWatermark: keyed
      // fingerprint state + watermark eviction) probed over the EVENT
      // stream: [[ScaleData]] multiplies doc IDs but not doc TEXTS, so
      // the gate's bag-of-words fingerprint state tops out at the base
      // corpus's ~4k distinct fingerprints at ANY factor — event_id is
      // the key that actually scales ×100, and the events' real
      // timestamps exercise the eviction leg the gate's constant-ts
      // corpus never can. Same operator, same watermark discipline.
      "m14_dedup" -> (() => evStream
        .withWatermark("tsec", "4 hours")
        .dropDuplicatesWithinWatermark("event_id")
        .select("event_id", "user_id", "value")),
      "m17_join_inner" -> (() => intervalJoin("inner")),
      "m21_join_outer" -> (() => intervalJoin("left_outer")),
      "m30_join_semi" -> (() => intervalJoin("left_semi")),
      "m31_join_full" -> (() => intervalJoin("full_outer")),
      // the arbitrary-keyed-state API (see profileWithExpiry's doc):
      // user_id is the key ScaleData actually multiplies, so state keys
      // scale ×N and the timeout leg evicts as the watermark advances
      "m18_profile_state" -> (() => {
        import spark.implicits._
        profileWithExpiry(evStream
          .select(col("user_id"), col("tsec"),
            col("value").cast("decimal(18,2)").as("v"))
          .withWatermark("tsec", "4 hours")
          .as[ProbeEvent]).toDF()
      }))

    // ---- run + harvest ---------------------------------------------------
    val out = new StringBuilder
    val evictBroken = scala.collection.mutable.ListBuffer[String]()
    // the artifact must stay valid JSONL whatever path the caller passed,
    // and the recorded dir is CANONICAL (ADVICE r15: ×1000 rows carried
    // `.benchdata/sf100` where every prior row was absolute, so tooling
    // keying on (q, dir) treated same-data rows as different datasets)
    val dirJ = new java.io.File(dir).getCanonicalPath
      .replace("\\", "\\\\").replace("\"", "\\\"")
    var total = 0.0
    shapes.filter(s => only.isEmpty || only(s._1)).foreach { case (name, mk) =>
      val ckpt = s"$base/ckpt/$name"
      val (st0, bz0) = hostStat()
      val w0 = System.nanoTime()
      val q = mk().writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - w0) / 1e9
      val (st1, bz1) = hostStat()
      val (faceSteal, faceBusy) =
        (if (st0 >= 0 && st1 >= 0) st1 - st0 else -1.0,
         if (bz0 >= 0 && bz1 >= 0) bz1 - bz0 else -1.0)
      total += wall
      val progs = q.recentProgress.toSeq
      val st = progs.flatMap(_.stateOperators.toSeq)
      def sumL(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) =
        st.map(f).sum
      val peakRows = if (st.isEmpty) 0L
        else progs.map(_.stateOperators.map(_.numRowsTotal).sum).max
      val endRows = progs.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      val peakMem = if (st.isEmpty) 0L
        else progs.map(_.stateOperators.map(_.memoryUsedBytes).sum).max
      val inRows = progs.map(_.numInputRows).sum
      val perBatchWall = progs.map(p =>
        p.durationMs.getOrDefault("triggerExecution", 0L).toLong / 1e3)
      // eviction assertion (VERDICT r13 #6, object doc): every probed
      // shape is watermark/timeout-bounded, so state must either tick the
      // removal counter or shrink BETWEEN SOME PAIR of batches (any
      // step-down, not just peak→end: on a corpus whose densest slice is
      // the last one, the final batch legitimately holds the peak while
      // mid-run eviction already proved the path works). The step-down
      // arm is what convicts m31 (RocksDB full-outer reports
      // numRowsRemoved=0 while evicting); a shape where NEITHER holds is
      // a broken eviction path and the probe exits nonzero.
      val removed = sumL(_.numRowsRemoved)
      val rowsByBatch = progs.map(_.stateOperators.map(_.numRowsTotal).sum)
      val evictOk = removed > 0 ||
        rowsByBatch.sliding(2).exists(w => w.size == 2 && w(1) < w(0))
      val j =
        f"""{"q":"$name","dir":"$dirJ","wall":$wall%.1f,"host_steal":$faceSteal%.1f,"host_busy":$faceBusy%.1f,"batches":${progs.size},"input_rows":$inRows,"state_rows_peak":$peakRows,"state_rows_end":$endRows,"rows_removed":$removed,"rows_updated":${sumL(_.numRowsUpdated)},"evict_ok":$evictOk,"state_mem_peak_mb":${peakMem / (1 << 20)},"batch_sec":[${perBatchWall.map(v => f"$v%.1f").mkString(",")}]}"""
      println(j)
      out.append(j).append('\n')
      if (!evictOk) evictBroken += name
    }
    println(f"""{"q":"probe_total","wall":$total%.1f,"dir":"$dirJ"}""")
    val w = new java.io.FileWriter("stream_probe.json", true)
    try w.write(out.toString) finally w.close()
    spark.stop()
    // per-run scratch (checkpoints + RocksDB working dirs + slices when
    // no SLICES_DIR pins them elsewhere) is ~25 GB at ×1000 — stale
    // dirs from a hunt's attempts filled the disk mid-round and
    // ENOSPC-killed a run, so a FINISHED probe cleans up after itself;
    // a pinned external slice layout is never touched
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base)): Unit
    // asserted AFTER every face ran and every row landed, so one broken
    // shape doesn't hide the others' evidence — but the probe still exits
    // nonzero instead of leaving a reader to spot evict_ok:false
    require(evictBroken.isEmpty, s"eviction broken (rows_removed=0 and " +
      s"state rows never shrank between batches) for: ${evictBroken.mkString(", ")}")
  }
}
