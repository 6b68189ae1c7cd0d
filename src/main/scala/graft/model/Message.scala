package graft.model

import java.sql.Timestamp

/** A message entry — the engine's single logical table.
  *
  * Mirrors the reference `Entry` (entry.go:42-50) re-expressed as a flat
  * Spark row: the 16-byte packed ID becomes plain `(ts, seq)` ordering
  * columns (the ID is reconstructible via [[MessageId]]), topic part hashes
  * become the `topic_parts` string array, and tenant isolation is the
  * `contract` column (reference default MasterContract, message/id.go:28).
  * `encrypted` mirrors the reference per-entry encryption flag
  * (entry.go:49); ciphertext lives only at rest (see UnitDb.writeStore).
  */
final case class Message(
    seq: Long,
    contract: Long,
    topic: String,
    topic_parts: Seq[String],
    is_wildcard: Boolean,
    is_multi: Boolean,
    depth: Int,
    ts: Timestamp,
    expires_at: Option[Timestamp],
    encrypted: Boolean,
    payload: Array[Byte])

object Message {
  /** Reference MasterContract (message/id.go:28). */
  val MasterContract: Long = 3376684800L

  /** Field names after `seq`, in declaration order — used by streaming
    * ingest to re-assemble a Message row around an externally assigned
    * seq (StreamIngest.appendBatch). */
  val columnsAfterSeq: Seq[String] = Seq(
    "contract", "topic", "topic_parts", "is_wildcard", "is_multi",
    "depth", "ts", "expires_at", "encrypted", "payload")
}

/** A delete marker, stored in the `_tombstones` sidecar rather than the main
  * table so readers never scan the full store to find deletions (the
  * reference instead frees the data block in place, db.go:392-425 — an
  * immutable-file store marks and compacts).
  */
final case class Tombstone(seq: Long, contract: Long, topic: String, ts: Timestamp)

/** 16-byte lexicographically sortable message ID, kept for API fidelity
  * with the reference (message/id.go:45-52, uid/uid.go:44-47): newer IDs
  * sort first. Layout: 4B inverted epoch-seconds, 4B contract-low-bits,
  * 8B seq.
  */
object MessageId {
  def encode(epochSec: Long, contract: Long, seq: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(16)
    b.putInt((~epochSec).toInt)       // inverted → descending time order
    b.putInt(contract.toInt)
    b.putLong(seq)
    b.array()
  }

  /** (epochSec, contract-low-32, seq) */
  def decode(id: Array[Byte]): (Long, Long, Long) = {
    require(id.length == 16, s"message id must be 16 bytes, got ${id.length}")
    val b = java.nio.ByteBuffer.wrap(id)
    val epoch = (~b.getInt).toLong & 0xFFFFFFFFL
    val contract = b.getInt.toLong & 0xFFFFFFFFL
    val seq = b.getLong
    (epoch, contract, seq)
  }
}

/** Write-side entry (reference entry.go:42-50). `ttlMillis` here wins over a
  * `?ttl=` topic option, matching `WithTTL`; `encrypt` requests payload
  * encryption at rest (requires the store to be opened with a key); `id`
  * presets the entry's 16-byte ID (reference Entry.WithID — the seq is
  * taken from the ID instead of drawn from the store counter; mint such
  * IDs with `UnitDb.newID()` so they never collide). */
final case class Entry(
    topic: String,
    payload: Array[Byte],
    contract: Long = Message.MasterContract,
    ttlMillis: Option[Long] = None,
    tsMillis: Option[Long] = None,
    encrypt: Boolean = false,
    id: Option[Array[Byte]] = None) {

  // fluent builders matching the reference Entry API (entry.go:62-95);
  // named copy() works too — these exist so ported call sites read 1:1

  def withID(id: Array[Byte]): Entry = copy(id = Some(id))
  def withPayload(payload: Array[Byte]): Entry = copy(payload = payload)
  def withContract(contract: Long): Entry = copy(contract = contract)
  def withEncryption(): Entry = copy(encrypt = true)

  /** Go-style duration TTL (`"1h"`, `"30m"` — reference WithTTL parses
    * the same strings the `?ttl=` topic option accepts). */
  def withTtl(ttl: String): Entry =
    copy(ttlMillis = Some(Topic.parseDurationMillis(ttl).getOrElse(
      throw new IllegalArgumentException(s"bad ttl duration: $ttl"))))
}

/** Read query (reference query.go:41-47): topic pattern with optional
  * `?last=` (duration or count), tenant, and result limit with the
  * reference's default/max clamps (options.go:169-174). */
final case class Query(
    topic: String,
    contract: Long = Message.MasterContract,
    limit: Int = 0) {
  def effectiveLimit: Int =
    if (limit <= 0) Query.DefaultLimit else math.min(limit, Query.MaxLimit)
}

object Query {
  val DefaultLimit = 1000
  val MaxLimit = 100000
}

/** Operation-duration statistics over a bounded reservoir, in µs — the
  * reference Varz's percentile block (meter.go:102-115: HMean, P50..P999,
  * Long5p/Short5p, Min/Max, StdDev from metrics/histogram.go). */
final case class LatencyStats(
    samples: Int,
    cumulativeUs: Double,
    avgUs: Double,
    hmeanUs: Double,
    p50Us: Double,
    p75Us: Double,
    p95Us: Double,
    p99Us: Double,
    p999Us: Double,
    long5pUs: Double,
    short5pUs: Double,
    minUs: Double,
    maxUs: Double,
    rangeUs: Double,
    stddevUs: Double)

object LatencyStats {
  val empty: LatencyStats =
    LatencyStats(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
}

/** Runtime metrics snapshot — the Spark-native `Varz()` (reference
  * db.go:475-482, meter.go:86-115). Counters are logical (pre-encryption
  * payload bytes); `fileSize` is physical bytes on disk; `latency` is the
  * op-duration histogram over put/get/sync (one reservoir, like the
  * reference's single event-duration sample). */
final case class Varz(
    puts: Long,
    gets: Long,
    deletes: Long,
    syncs: Long,
    entriesRead: Long,
    bytesWritten: Long,
    bytesRead: Long,
    fileSize: Long,
    latency: LatencyStats = LatencyStats.empty,
    aborts: Long = 0L,
    recovers: Long = 0L,
    putLatency: LatencyStats = LatencyStats.empty,
    getLatency: LatencyStats = LatencyStats.empty,
    syncLatency: LatencyStats = LatencyStats.empty)
