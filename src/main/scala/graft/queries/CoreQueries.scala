package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TopicMatches
import graft.queries.QUtil._

/** The reference's own query surface (SURVEY §2.1) demonstrated on the
  * `events` table treated as the message log: `event_type` + derived
  * buckets play the hierarchical topic, `ts` the arrival time, and
  * `value`-derived TTLs the expiry window.
  *
  *  - m1_relay            = O4/S3 Get/RELAY: cutoff + newest-first + limit
  *  - m2_wildcard_star    = O5/O6 single-level `*` matching (topic_matches)
  *  - m3_wildcard_multi   = O5/O6 trailing `...` matching
  *  - m4_ttl_live         = O14 TTL visibility at a cutoff instant
  *  - m5_newest_per_topic = O7 window-chain walk: newest-N per topic
  *  - m6_counts           = O17 Count/metrics surface
  */
object CoreQueries {

  /** Deterministic cutoff inside the generated data's time range. */
  private val CutoffSql = "TIMESTAMP '2024-01-08 00:00:00'"
  private val CutoffEpoch = 1704672000L // 2024-01-08T00:00:00Z

  private def topicCol =
    concat_ws(".", col("event_type"),
      concat(lit("u"), (col("user_id") % 10).cast("string")),
      concat(lit("ch"), (col("event_id") % 5).cast("string")))

  private val duckTopic =
    "event_type || '.u' || CAST(user_id % 10 AS VARCHAR) || '.ch' || CAST(event_id % 5 AS VARCHAR)"

  val queries: Map[String, QFn] = Map(
    // Get/RELAY: newest ≤100 'click' payloads since the cutoff, newest-first
    // (reference db.go:222-319: filter + top-K, here TakeOrderedAndProject).
    "m1_relay" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type") === "click" && tsec(col("ts")) >= CutoffEpoch)
        .select(col("event_id"), col("user_id"), col("value"),
          tsec(col("ts")).as("t"))
        .orderBy(col("t").desc, col("event_id").desc)
        .limit(100)
    },

    // Single-level wildcard over the derived topic hierarchy.
    "m2_wildcard_star" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("topic", topicCol)
        .filter(TopicMatches(col("topic"), lit("click.*.ch3")))
        .select("event_id", "topic")
        .orderBy("event_id")
    },

    // Multi-level trailing '...' wildcard.
    "m3_wildcard_multi" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("topic", topicCol)
        .filter(TopicMatches(col("topic"), lit("purchase...")))
        .select("event_id", "topic")
        .orderBy("event_id")
    },

    // TTL visibility: expiry = ts + floor(value) minutes; count live rows
    // at the cutoff instant per topic (reference isExpired,
    // time_window.go:63-65 + expirer db_sync.go:306-328).
    "m4_ttl_live" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("exp", tsec(col("ts")) + floor(col("value")).cast("long") * 60)
        .filter(col("exp") > CutoffEpoch && tsec(col("ts")) <= CutoffEpoch)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_live"))
        .orderBy("event_type")
    },

    // Newest-3 per topic (reference per-topic window chains, newest first).
    // Two-phase tournament instead of a single window: event_type has ~5
    // distinct values, so a straight partitionBy(event_type) window funnels
    // every row through 5 tasks at any scale (VERDICT r1 skew note). Phase
    // 1 takes top-3 per (topic, input-partition) — the salt is the physical
    // partition id, giving keys × partitions balanced groups; phase 2 ranks
    // only the ≤ 3·P survivors per topic. The global top-3 per key is
    // always a subset of the per-partition top-3s, so results are
    // identical row-for-row.
    "m5_newest_per_topic" -> { (s, dir) =>
      val base = Tables.events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"),
          tsec(col("ts")).as("t"))
        .withColumn("pid", spark_partition_id())
      val w1 = Window.partitionBy("event_type", "pid")
        .orderBy(col("t").desc, col("event_id").desc)
      val w2 = Window.partitionBy("event_type")
        .orderBy(col("t").desc, col("event_id").desc)
      base
        .withColumn("rn1", row_number().over(w1))
        .filter(col("rn1") <= 3)
        .withColumn("rn", row_number().over(w2))
        .filter(col("rn") <= 3)
        .select("event_type", "rn", "event_id", "value")
        .orderBy("event_type", "rn")
    },

    // Semi-structured payloads: JSON property extraction + aggregation
    // (an engine extension — the reference treats payloads as opaque
    // bytes; a training pipeline reads them). get_json_object is
    // codegen'd; at scale prefer from_json with an explicit schema once
    // fields stabilize (single parse, columnar after).
    "m10_props_json" -> { (s, dir) =>
      // JSON parsing is a CPU kernel: spread the one-partition test scan
      // across the cluster first (no-op at real scan parallelism)
      QUtil.spread(Tables.events(s, dir).select("event_type", "props"))
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"),
          countDistinct(col("k")).as("nd_k"))
        .orderBy("event_type")
    },

    // Count / metrics surface: per-topic counts, distinct publishers, and
    // exact value stats (reference Count db.go:475-478; Varz meter.go).
    "m6_counts" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          asDouble(sum(dec2(col("value")))).as("sum_value"),
          min("event_id").as("first_id"),
          max("event_id").as("last_id"))
        .orderBy("event_type")
    }
  )

  val oracles: Map[String, String] = Map(
    "m1_relay" ->
      s"""SELECT event_id, user_id, value, ${duckTsec("ts")} AS t
        |FROM events
        |WHERE event_type = 'click' AND ${duckTsec("ts")} >= $CutoffEpoch
        |ORDER BY t DESC, event_id DESC LIMIT 100""".stripMargin,

    "m2_wildcard_star" ->
      s"""SELECT event_id, $duckTopic AS topic FROM events
        |WHERE regexp_matches($duckTopic, '^click\\.[^.]+\\.ch3$$')
        |ORDER BY event_id""".stripMargin,

    "m3_wildcard_multi" ->
      s"""SELECT event_id, $duckTopic AS topic FROM events
        |WHERE regexp_matches($duckTopic, '^purchase(\\..*)?$$')
        |ORDER BY event_id""".stripMargin,

    "m4_ttl_live" ->
      s"""SELECT event_type, COUNT(*) AS n_live FROM (
        |  SELECT event_type,
        |         ${duckTsec("ts")} AS t,
        |         ${duckTsec("ts")} + CAST(FLOOR(value) AS BIGINT) * 60 AS exp
        |  FROM events)
        |WHERE exp > $CutoffEpoch AND t <= $CutoffEpoch
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "m5_newest_per_topic" ->
      s"""SELECT event_type, rn, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY ${duckTsec("ts")} DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn <= 3 ORDER BY event_type, rn""".stripMargin,

    "m10_props_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS nd_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "m6_counts" ->
      """SELECT event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MIN(event_id) AS first_id, MAX(event_id) AS last_id
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
