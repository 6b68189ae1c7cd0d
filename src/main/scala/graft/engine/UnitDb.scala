package graft.engine

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TopicMatches
import graft.model.{Entry, Message, Query, Topic}

/** Embedded message-store facade — the Spark-native re-expression of the
  * reference `DB` API (db.go:50-482).
  *
  * Storage model (SURVEY §1.4): one immutable Parquet table partitioned by
  * `(contract, day)`, snappy-compressed, plus a small driver-side pending
  * buffer that makes unsynced writes immediately queryable (the moral
  * equivalent of the reference memdb read-through, db_internal.go:196-212).
  *
  *  - `put`/`putEntry` (db.go:339-387)  → buffer, then one atomic Parquet
  *    append per `sync()` (the reference tiny-log → WAL → block-sync
  *    pipeline collapses into Spark's file-commit protocol, SURVEY §3.2).
  *  - `get`       (db.go:222-319)  → declarative filter + top-K; Catalyst
  *    turns it into partition-pruned scan + TakeOrderedAndProject.
  *  - `delete`    (db.go:392-425)  → tombstone append + anti-join on read.
  *  - TTL/expiry  (db_sync.go:306-328) → `expires_at` visibility predicate
  *    on read + `vacuum()` compaction.
  *  - `batch`     (db.go:434-447)  → buffered entries committed as a single
  *    atomic append, aborted on exception.
  *
  * At cluster scale the `(contract, day)` partitioning gives tenant + time
  * pruning for every `?last=` query; within files rows are sorted by
  * `(topic, ts)` so Parquet row-group stats prune static-topic reads.
  */
final class UnitDb private (
    val spark: SparkSession,
    val path: String,
    clock: () => Long,
    autoFlushRows: Int) {

  import UnitDb._

  private val pending = ArrayBuffer[Message]()
  private val seqCounter = new AtomicLong(0L)
  @volatile private var storeExists = hasStore

  // recover last assigned seq from the store (reference recovery.go:45-178
  // rebuilds from WAL; we just ask the table)
  if (storeExists) {
    val row = readStoreRaw().agg(max("seq")).head()
    if (!row.isNullAt(0)) seqCounter.set(row.getLong(0))
  }

  // ---------------------------------------------------------------- write

  /** Append under the master contract (reference db.go:339-341). */
  def put(topic: String, payload: Array[Byte]): Unit =
    putEntry(Entry(topic, payload))

  /** Append with contract/TTL (reference db.go:346-387). Topic may carry a
    * `?ttl=` option; an explicit `Entry.ttlMillis` wins. */
  def putEntry(e: Entry): Unit = synchronized {
    pending += toMessage(e)
    if (pending.size >= autoFlushRows) sync()
  }

  /** Delete one message by seq + topic — appends a tombstone; readers
    * anti-join it out (reference db.go:392-425 frees the block instead). */
  def delete(seq: Long, topic: String, contract: Long = Message.MasterContract): Unit =
    synchronized {
      val t = Topic.parse(topic)
      pending += Message(seq, contract, t.key, t.parts, t.isWildcard, t.depth,
        new Timestamp(clock()), None, del_flag = true, Array.emptyByteArray)
    }

  /** Atomic multi-put (reference db.go:434-447, batch.go:195-257): entries
    * buffered locally, committed as one append; exception ⇒ abort. */
  def batch(fn: BatchWriter => Unit): Unit = {
    val b = new BatchWriter(this)
    fn(b) // throws ⇒ nothing written
    synchronized {
      pending ++= b.entries
      sync()
    }
  }

  /** Flush the pending buffer as one atomic Parquet append (reference
    * DB.Sync, db.go:452-472). */
  def sync(): Unit = synchronized {
    if (pending.nonEmpty) {
      val ds = spark.createDataset(pending.toSeq)(Encoders.product[Message])
      writeStore(ds.toDF(), SaveMode.Append)
      pending.clear()
      storeExists = true
    }
  }

  // ----------------------------------------------------------------- read

  /** Core query (reference db.go:222-319): topics matching the pattern
    * under the contract, newer than the `?last=` cutoff, live (not deleted,
    * not expired), newest-first, limited. Returns payloads newest-first. */
  def get(q: Query): Array[Array[Byte]] =
    getFrame(q).select("payload").collect().map(_.getAs[Array[Byte]](0))

  /** Same as [[get]] but as a DataFrame of (seq, topic, ts, payload) —
    * composable with further Spark ops. */
  def getFrame(q: Query): DataFrame = {
    val t = Topic.parse(q.topic)
    val nowMs = clock()

    // ?last= : duration ⇒ time cutoff; integer ⇒ result-count limit
    // (reference query.go:72-88, message/topic.go:119-133)
    val (cutoffMs, lastCount) = t.last match {
      case Some(Right(durMs)) => (Some(nowMs - durMs), None)
      case Some(Left(count))  => (None, Some(count))
      case None               => (None, None)
    }
    val limit = lastCount
      .map(c => math.min(c, Query.MaxLimit))
      .getOrElse(q.effectiveLimit)

    val all = snapshot()
    var pred: Column =
      col("contract") === q.contract &&
      !col("del_flag") &&
      (col("expires_at").isNull || col("expires_at") > lit(new Timestamp(nowMs)))

    // static patterns get an equality fast-path that Parquet can prune on;
    // stored wildcard topics are still matched bidirectionally (SURVEY §7.4)
    val topicPred =
      if (!t.isWildcard)
        col("topic") === t.key ||
        (col("is_wildcard") && TopicMatches(col("topic"), lit(t.key)))
      else TopicMatches(col("topic"), lit(t.key))
    pred = pred && topicPred

    cutoffMs.foreach { c =>
      // partition pruning on the day column: the cutoff day must be computed
      // in the SAME zone that derived the stored `day` strings (the session
      // timezone, via date_format in withDay) or rows near midnight would be
      // wrongly pruned in non-UTC sessions (ADVICE r1).
      pred = pred && col("ts") >= lit(new Timestamp(c)) &&
        col("day") >= lit(dayOf(c, sessionZone))
    }

    val tombstones = all.filter(col("del_flag")).select("seq").distinct()
    all.filter(pred)
      .join(broadcast(tombstones), Seq("seq"), "left_anti")
      .orderBy(col("ts").desc, col("seq").desc)
      .limit(limit)
      .select("seq", "topic", "ts", "payload")
  }

  /** Live-entry count (reference db.go:475-478). */
  def count(): Long = {
    val all = snapshot()
    val tombstones = all.filter(col("del_flag")).select("seq").distinct()
    all.filter(!col("del_flag") &&
        (col("expires_at").isNull || col("expires_at") > lit(new Timestamp(clock()))))
      .join(broadcast(tombstones), Seq("seq"), "left_anti")
      .count()
  }

  /** Full snapshot (store + unsynced pending), with the `day` partition
    * column retained for pruning. */
  def snapshot(): DataFrame = {
    val pendingDf = synchronized {
      if (pending.isEmpty) None
      else Some(withDay(
        spark.createDataset(pending.toSeq)(Encoders.product[Message]).toDF()))
    }
    val store = if (storeExists) Some(readStoreRaw()) else None
    (store, pendingDf) match {
      case (Some(s), Some(p)) => s.unionByName(p)
      case (Some(s), None)    => s
      case (None, Some(p))    => p
      case (None, None) =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
    }
  }

  // ---------------------------------------------------------- maintenance

  /** Compaction: physically drop tombstoned and expired rows, rewriting the
    * table atomically (write-new-then-swap — the moral equivalent of the
    * reference block_writer rollback protocol, block_writer.go:291-322, and
    * its expirer, db_sync.go:306-328). */
  def vacuum(): Unit = synchronized {
    sync()
    if (!storeExists) return
    val all = readStoreRaw()
    val tombstones = all.filter(col("del_flag")).select("seq").distinct()
    val live = all
      .filter(!col("del_flag") &&
        (col("expires_at").isNull || col("expires_at") > lit(new Timestamp(clock()))))
      .join(broadcast(tombstones), Seq("seq"), "left_anti")
    // The tmp-dir write below fully materializes `live` from the old files
    // before any move touches them — no cache needed (caching the whole
    // table was an OOM hazard at scale, ADVICE r1).
    // NOTE: the two-move swap assumes a local POSIX fs and a single writer;
    // on an object store this would need a manifest-swap commit instead.
    val tmp = path + ".compact.tmp"
    val old = path + ".compact.old"
    writeStoreTo(live, tmp)
    val p = Paths.get(path); val pt = Paths.get(tmp); val po = Paths.get(old)
    Files.move(p, po, StandardCopyOption.ATOMIC_MOVE)
    Files.move(pt, p, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(po.toFile)
  }

  // ------------------------------------------------------------ internals

  private[engine] def mkMessage(e: Entry): Message = toMessage(e)

  private def toMessage(e: Entry): Message = {
    require(e.topic.nonEmpty, "empty topic")
    require(e.payload != null && e.payload.length <= MaxValueLength,
      "payload exceeds 1 GiB")
    val t = Topic.parse(e.topic)
    val tsMs = e.tsMillis.getOrElse(clock())
    val ttl = e.ttlMillis.orElse(t.ttlMillis)
    Message(
      seq = seqCounter.incrementAndGet(),
      contract = e.contract,
      topic = t.key,
      topic_parts = t.parts,
      is_wildcard = t.isWildcard,
      depth = t.depth,
      ts = new Timestamp(tsMs),
      expires_at = ttl.map(ms => new Timestamp(tsMs + ms)),
      del_flag = false,
      payload = e.payload)
  }

  private def withDay(df: DataFrame): DataFrame =
    df.withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))

  /** Lazily resolved session timezone — the zone `withDay`'s date_format
    * uses, so cutoff-day pruning agrees with the stored partition values. */
  private def sessionZone: java.time.ZoneId =
    java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)

  private def writeStore(df: DataFrame, mode: SaveMode): Unit =
    configureWriter(withDay(df).sortWithinPartitions("topic", "ts")
      .write.mode(mode)).parquet(path)

  private def writeStoreTo(df: DataFrame, target: String): Unit =
    configureWriter(df.sortWithinPartitions("topic", "ts")
      .write.mode(SaveMode.Overwrite)).parquet(target)

  /** Shared writer config: snappy at rest (reference db_internal.go:292) and
    * Parquet bloom filters on `seq` + `topic` — the Spark-native form of the
    * reference's per-seq bloom consulted before delete/expiry reads
    * (filter.go:33-45, SURVEY §1.3). Row-group min/max stats on the sorted
    * `topic` column do the positive-lookup pruning; the blooms kill negative
    * point lookups without touching pages. */
  private def configureWriter(w: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]) =
    w.partitionBy("contract", "day")
      .option("compression", "snappy")
      .option("parquet.bloom.filter.enabled#seq", "true")
      .option("parquet.bloom.filter.expected.ndv#seq", "1000000")
      .option("parquet.bloom.filter.enabled#topic", "true")
      .option("parquet.bloom.filter.expected.ndv#topic", "100000")

  private def readStoreRaw(): DataFrame =
    spark.read.schema(storeSchema).parquet(path)

  private def hasStore: Boolean = {
    val f = Paths.get(path)
    Files.exists(f) && Files.isDirectory(f) &&
      f.toFile.listFiles != null && f.toFile.listFiles.exists { d =>
        d.getName.startsWith("contract=") || d.getName.endsWith(".parquet")
      }
  }
}

object UnitDb {
  /** Reference caps payloads at 1 GiB (db_internal.go:56-66). */
  val MaxValueLength: Int = Int.MaxValue

  import org.apache.spark.sql.types._
  val storeSchema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("contract", LongType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("topic_parts", ArrayType(StringType, containsNull = false)),
    StructField("is_wildcard", BooleanType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("expires_at", TimestampType, nullable = true),
    StructField("del_flag", BooleanType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("day", StringType, nullable = false)))

  private def dayOf(ms: Long, zone: java.time.ZoneId): String =
    java.time.Instant.ofEpochMilli(ms).atZone(zone).toLocalDate.toString

  /** Open (or create) a store directory (reference db.go:50-210). */
  def open(
      spark: SparkSession,
      path: String,
      clock: () => Long = () => System.currentTimeMillis(),
      autoFlushRows: Int = 100000): UnitDb = {
    TopicMatches.register(spark)
    Files.createDirectories(Paths.get(path))
    new UnitDb(spark, path, clock, autoFlushRows)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }
}

/** Buffered writer handed to [[UnitDb.batch]] (reference batch.go:64-257). */
final class BatchWriter private[engine] (db: UnitDb) {
  private[engine] val entries = ArrayBuffer[Message]()
  private var batchContract: Option[Long] = None
  private var batchTtl: Option[Long] = None

  def withContract(c: Long): this.type = { batchContract = Some(c); this }
  def withTtl(ms: Long): this.type = { batchTtl = Some(ms); this }

  def put(topic: String, payload: Array[Byte]): Unit =
    putEntry(Entry(topic, payload,
      contract = batchContract.getOrElse(Message.MasterContract),
      ttlMillis = batchTtl))

  def putEntry(e: Entry): Unit = {
    val withDefaults = e.copy(
      contract = batchContract.getOrElse(e.contract),
      ttlMillis = e.ttlMillis.orElse(batchTtl))
    entries += db.synchronized {
      // share the db's seq counter + clock via a package-private hook
      db.mkMessage(withDefaults)
    }
  }
}
