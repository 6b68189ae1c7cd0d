package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.engine.UnitDb
import graft.functions.TopicMatches
import graft.model.{Message, Query, Topic, TopicKey}

/** A registered subscription (reference SUBSCRIBE, server/internal/
  * hdl_conn.go:384-431 + server/proto/unitdb.proto:113-127): a topic
  * pattern under a contract, with a delivery mode (docs/utp.md
  * §Delivery-Mode: 0 express / 1 reliable / 2 batch). */
final case class Subscription(
    sub_id: Long,
    pattern: String,
    contract: Long = Message.MasterContract,
    delivery_mode: Int = Subscribe.Express)

/** S2 SUBSCRIBE / S3 RELAY — message fan-out and historical replay.
  *
  * Fan-out is a stream-static **broadcast** join of the message stream
  * against the subscriptions table on `topic_matches(topic, pattern)`:
  * subscriptions are tiny relative to message volume (the reference holds
  * them in one in-memory trie per node), so every executor matches its
  * message partitions locally — no shuffle of the stream, which is the
  * only plan shape that survives 100 TB/day ingest.
  */
object Subscribe {

  /** Delivery modes (docs/utp.md §Delivery-Mode). Express delivers
    * at-least-once straight from the batch; reliable adds a keyed dedupe
    * within the watermark (idempotent delivery); batch mode groups
    * deliveries per micro-batch — `foreachBatch` IS that semantics. */
  val Express = 0
  val Reliable = 1
  val BatchMode = 2

  /** S5 on the SUBSCRIBE face (reference onSecureRequest,
    * server/internal/hdl_conn.go:489-507: a subscribe under secure mode
    * must carry a read-authorizing key for its pattern): split a
    * subscriptions table whose `pattern` strings are `key/pattern` into
    * (authorized-with-bare-patterns, rejected). The rejected frame is
    * the caller's to surface — the reference errors the one SUBSCRIBE,
    * never the connection, so the fan-out analogue is per-row exclusion,
    * not query failure. The key check is the
    * [[graft.functions.TopicKeyValidate]] codegen expression (decode +
    * salted-hash bit math), so even this resolution-time frame never
    * drops out of whole-stage codegen. */
  def validSubs(subscriptions: DataFrame,
      flag: Int = TopicKey.AllowRead): (DataFrame, DataFrame) = {
    val hasContract = subscriptions.columns.contains("contract")
    val hasKey = instr(col("pattern"), TopicKey.Separator.toString) > 0
    val keyed = subscriptions
      .withColumn("__key",
        when(hasKey, expr("substring_index(pattern, '/', 1)")).otherwise(lit("")))
      .withColumn("__bare",
        when(hasKey, expr("substring(pattern, instr(pattern, '/') + 1)"))
          .otherwise(col("pattern")))
      // coalesce: a NULL pattern/contract nulls the (null-intolerant)
      // expression — such rows must surface in REJECTED, not vanish from
      // both frames (the per-row-exclusion contract)
      .withColumn("__ok", coalesce(graft.functions.TopicKeyValidate(
        col("__key"), col("__bare"),
        (if (hasContract) col("contract") else lit(Message.MasterContract))
          .cast("long"), flag), lit(false)))
    val kept = keyed.filter(col("__ok"))
      .withColumn("pattern", col("__bare"))
      .drop("__key", "__bare", "__ok")
    val rejected = keyed.filter(!col("__ok")).drop("__key", "__bare", "__ok")
    (kept, rejected)
  }

  /** Fan-out join (batch or streaming `messages`): one output row per
    * (message, matching subscription) pair, carrying the subscription's
    * `sub_id` + `delivery_mode`. Wildcards work on BOTH sides (a stored
    * wildcard publish reaches a static subscription and vice versa —
    * SURVEY §2.3 rule 1). */
  def fanout(messages: DataFrame, subscriptions: DataFrame): DataFrame = {
    val subs = subscriptions.select(
      col("sub_id"), col("pattern"),
      col("contract").as("_sub_contract"), col("delivery_mode"))
    val msgs =
      if (messages.columns.contains("contract")) messages
      else messages.withColumn("contract", lit(Message.MasterContract))
    msgs.join(
        broadcast(subs),
        msgs("contract") === subs("_sub_contract") &&
          TopicMatches(msgs("topic"), subs("pattern")),
        "inner")
      .drop("_sub_contract")
  }

  /** Fan-out for LARGE subscription tables (millions of subscribers —
    * where broadcasting all of [[fanout]]'s table would not fit): patterns
    * anchored on a concrete first level become an *equi-join* on that
    * level (shuffle or broadcast as the optimizer sizes it, with
    * `topic_matches` as the residual), and only the unanchored patterns
    * (`*...`/`...`-prefixed — rare by construction) are broadcast to every
    * message. The same split the engine's wc-bucket gives stored topics,
    * applied to the subscription side. Results are identical to
    * [[fanout]]. */
  def fanoutPartitioned(messages: DataFrame, subscriptions: DataFrame): DataFrame = {
    // first level of a key; '' / null / '*' all mean "unanchored"
    def lvl0(c: Column): Column = split(c, "\\.").getItem(0)
    def unanchored(p0: Column): Column =
      p0.isNull || p0 === "" || p0 === Topic.Single

    val subs = subscriptions.select(
      col("sub_id"), col("pattern"),
      col("contract").as("_sub_contract"), col("delivery_mode"),
      lvl0(col("pattern")).as("_p0"))
    val anchored = subs.filter(!unanchored(col("_p0")))
    val floating = subs.filter(unanchored(col("_p0")))

    val msgs0 = (if (messages.columns.contains("contract")) messages
      else messages.withColumn("contract", lit(Message.MasterContract)))
      .withColumn("_m0", lvl0(col("topic")))
    val staticMsgs = msgs0.filter(!unanchored(col("_m0")))
    val wildMsgs = msgs0.filter(unanchored(col("_m0")))

    // the bulk: static-first messages × anchored patterns — pure equi-join
    // on (level0, contract), topic_matches as the residual; Catalyst picks
    // shuffle-hash vs broadcast by size
    val anchoredHits = staticMsgs.join(anchored,
      col("_m0") === col("_p0") &&
        col("contract") === col("_sub_contract") &&
        TopicMatches(col("topic"), col("pattern")), "inner")
    // unanchored patterns are rare by construction — broadcast them to all
    val floatingHits = staticMsgs.join(broadcast(floating),
      col("contract") === col("_sub_contract") &&
        TopicMatches(col("topic"), col("pattern")), "inner")
    // wildcard-first publishes are rare (the engine's wc=1 bucket): they
    // can match any pattern, so join the small side against ALL
    // subscriptions on the contract equi-key
    val wildHits = wildMsgs.join(subs,
      col("contract") === col("_sub_contract") &&
        TopicMatches(col("topic"), col("pattern")), "inner")

    anchoredHits.unionByName(floatingHits).unionByName(wildHits)
      .drop("_sub_contract", "_p0", "_m0")
  }

  /** Reliable-mode wrapper (streaming): drop duplicate deliveries keyed by
    * `keys` inside the watermark window — republished/replayed messages
    * become idempotent per subscriber (reference RECEIPT/COMPLETE
    * handshake, docs/utp.md). State is bounded by the watermark. */
  def reliable(
      fanned: DataFrame,
      keys: Seq[String] = Seq("sub_id", "seq"),
      watermarkDelay: String = "1 hour"): DataFrame =
    fanned
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Long-lived SUBSCRIBE query: the fan-out join runs inside the
    * *streaming* plan (stream-static broadcast join — re-resolved per
    * micro-batch), optionally deduped for reliable mode, then handed to
    * `deliver` per micro-batch with rows
    * (sub_id, delivery_mode, topic, ts, payload, ...). */
  def start(
      messages: DataFrame,
      subscriptions: DataFrame,
      checkpointDir: String,
      deliver: (DataFrame, Long) => Unit,
      queryName: String = "graft_subscribe",
      trigger: Trigger = Trigger.ProcessingTime(0L),
      mode: Int = Express,
      reliableKeys: Seq[String] = Seq("sub_id", "seq"),
      fanoutFn: (DataFrame, DataFrame) => DataFrame = fanout): StreamingQuery = {
    val fanned = fanoutFn(messages, subscriptions)
    val shaped = if (mode == Reliable) reliable(fanned, reliableKeys) else fanned
    val fn: (Dataset[Row], Long) => Unit =
      (batch, batchId) => deliver(batch.toDF(), batchId)
    shaped.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(fn)
      .start()
  }

  /** Long-lived SUBSCRIBE with DYNAMIC subscriptions (reference
    * subscribers register and deregister live — onSubscribe/onUnsubscribe,
    * server/internal/hdl_conn.go:384-431). [[start]] freezes its
    * subscription DataFrame's *file listing* at plan time (a parquet
    * relation caches its InMemoryFileIndex), so rows added or removed
    * after the query starts are silently invisible to it — and an
    * in-memory frame can never change at all. Here the subscription table
    * is RESOLVED FRESH each micro-batch: `loadSubs` runs inside
    * foreachBatch, so SUBSCRIBE = append a row to the backing table and
    * UNSUBSCRIBE = remove it (rewrite/tombstone), each honored from the
    * next batch on — the same granularity as the reference's per-node
    * registry updates. The per-batch fan-out is the identical broadcast
    * (or partitioned) join [[start]] plans; only the resolution point
    * moves. Subscriptions tables are tiny, so the per-batch re-read is a
    * metadata listing + small scan, not a scale cost.
    *
    * Reliable mode (reference subscribers get reliable delivery no matter
    * when they subscribed, hdl_conn.go:384-431): per-subscriber dedup
    * state cannot live in the streaming plan here — the fan-out happens
    * inside foreachBatch, after the stateful operators — so reliability
    * is composed at the *message* level instead: the stream is deduped on
    * `dedupKeys` (default `seq` — the store-unique identity) within the
    * watermark BEFORE fan-out. A republished/replayed message then
    * reaches EVERY current subscriber at most once per retention window,
    * which implies at-most-once per subscriber. The difference from
    * [[start]]'s `(sub_id, seq)` keying: a subscriber who joins after a
    * message was already delivered does not receive its republish (the
    * message is spent stream-wide) — the reference behaves the same way,
    * as its delivery dedup rides the message seq, not the subscriber. */
  def startDynamic(
      messages: DataFrame,
      loadSubs: org.apache.spark.sql.SparkSession => DataFrame,
      checkpointDir: String,
      deliver: (DataFrame, Long) => Unit,
      queryName: String = "graft_subscribe_dyn",
      trigger: Trigger = Trigger.ProcessingTime(0L),
      fanoutFn: (DataFrame, DataFrame) => DataFrame = fanout,
      mode: Int = Express,
      dedupKeys: Seq[String] = Seq("seq"),
      watermarkDelay: String = "1 hour"): StreamingQuery = {
    val shaped =
      if (mode == Reliable)
        messages.withWatermark("ts", watermarkDelay)
          .dropDuplicatesWithinWatermark(dedupKeys.head, dedupKeys.tail: _*)
      else messages
    val fn: (Dataset[Row], Long) => Unit = (batch, batchId) =>
      deliver(fanoutFn(batch.toDF(), loadSubs(batch.sparkSession)), batchId)
    shaped.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch(fn)
      .start()
  }

  /** S3 RELAY (reference server/internal/hdl_conn.go:349-381): historical
    * replay of a subscription pattern — the batch face of the core `get`
    * query, returned as a DataFrame the caller streams to the requester.
    * The live continuation is a [[start]] whose stream begins at the
    * replay instant. */
  def relay(db: UnitDb, pattern: String, contract: Long = Message.MasterContract,
      limit: Int = 0): DataFrame =
    db.getFrame(Query(pattern, contract, limit))

  /** The full reference server loop with NO server in the path:
    * subscribers follow a STORE — [[UnitDb.tail]]'s change stream fanned
    * out by the same subscription join the ingest-side [[start]] plans.
    * Where [[start]] requires the subscriber to sit inside the publisher's
    * ingest topology, this decouples them completely: the publisher is
    * any process appending to the store (embedded puts, a StreamIngest
    * query, another cluster), the subscriber is any process that can read
    * it — the reference's broker becomes the storage layout itself.
    * Replay-then-live composes as in the reference: [[relay]] for
    * history, this from the replay instant.
    *
    * `pattern` pre-filters the tail server-side (partition pruning +
    * pushed topic equality); each subscription's own pattern then routes
    * within that stream, so a broad tail (`"..."`) with many
    * subscriptions is one streaming scan, not one per subscriber. */
  def followStore(
      db: UnitDb,
      pattern: String,
      subscriptions: DataFrame,
      checkpointDir: String,
      deliver: (DataFrame, Long) => Unit,
      queryName: String = "graft_follow",
      trigger: Trigger = Trigger.ProcessingTime(0L),
      contract: Long = Message.MasterContract,
      mode: Int = Express): StreamingQuery = {
    val msgs = db.tail(Query(pattern, contract))
      .withColumn("contract", lit(contract))
    start(msgs, subscriptions, checkpointDir, deliver, queryName, trigger, mode)
  }
}

/** S4 delivery-mode flow control (reference docs/utp.md §Delivery-Mode,
  * server/utp/flow_control.go): batch-mode subscribers receive deliveries
  * grouped by count/delay thresholds rather than per message. The
  * Spark-native form is keyed state per subscriber —
  * `flatMapGroupsWithState` buffers fanned-out rows and emits a
  * [[FlowControl.Delivery]] when the count threshold fills, or flushes a
  * partial batch on processing-time timeout (the reference's delay
  * trigger). State is per-subscriber, bounded by maxCount rows. */
object FlowControl {

  /** One delivery batch to one subscriber. */
  final case class Delivery(
      sub_id: Long,
      batch_seq: Long,
      n: Int,
      topics: Seq[String],
      payloads: Seq[Array[Byte]])

  /** Keyed buffer (public for the state encoder). */
  final case class Buf(
      batchSeq: Long, n: Int, topics: List[String], payloads: List[Array[Byte]])

  private def emit(subId: Long, st: Buf): Delivery =
    Delivery(subId, st.batchSeq, st.n, st.topics.reverse, st.payloads.reverse)

  /** Group a *streaming* fanned-out frame (from [[Subscribe.fanout]]) into
    * per-subscriber delivery batches of up to `maxCount` messages. With the
    * default ProcessingTimeTimeout, partial batches flush after
    * `maxDelayMs` without new input (note: timeout mode keeps the
    * micro-batch engine ticking between arrivals — pick a real trigger
    * interval on the query; pass `GroupStateTimeout.NoTimeout` for pure
    * count-triggered batching). Output mode: append. */
  def batched(
      fanned: DataFrame,
      maxCount: Int,
      maxDelayMs: Long = 60000L,
      timeout: org.apache.spark.sql.streaming.GroupStateTimeout =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout)
      : org.apache.spark.sql.Dataset[Delivery] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val withDelay = timeout == GroupStateTimeout.ProcessingTimeTimeout
    val func = (subId: Long, rows: Iterator[(Long, String, Array[Byte])],
        state: GroupState[Buf]) => {
      var st = state.getOption.getOrElse(Buf(0L, 0, Nil, Nil))
      val out = scala.collection.mutable.ArrayBuffer[Delivery]()
      if (state.hasTimedOut) {
        if (st.n > 0) out += emit(subId, st)
        state.remove()
      } else {
        rows.foreach { r =>
          st = Buf(st.batchSeq, st.n + 1, r._2 :: st.topics, r._3 :: st.payloads)
          if (st.n >= maxCount) {
            out += emit(subId, st)
            st = Buf(st.batchSeq + 1, 0, Nil, Nil)
          }
        }
        state.update(st)
        if (withDelay) state.setTimeoutDuration(maxDelayMs)
      }
      out.iterator
    }
    fanned
      .select(col("sub_id").cast("long"), col("topic").cast("string"), col("payload"))
      .as(org.apache.spark.sql.Encoders.product[(Long, String, Array[Byte])])
      .groupByKey(_._1)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        func)(org.apache.spark.sql.Encoders.product[Buf],
          org.apache.spark.sql.Encoders.product[Delivery])
  }
}
