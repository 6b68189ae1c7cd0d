package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.queries.QUtil._

/** Time-series windowed aggregations over event time (BASELINE.json names
  * these; the reference's 1-second ingest "time blocks",
  * memdb/tiny_log.go:122-128, are its only window notion — tumbling /
  * sliding / session windows are the Spark-native generalization).
  *
  * The same `window()`/`session_window()` expressions run unchanged under
  * Structured Streaming with a watermark (proved by StreamingSpec); these
  * batch faces are the oracle-checked correctness gate. Window starts are
  * emitted as epoch seconds (BIGINT) so the DuckDB comparison is
  * timezone-free.
  *
  *  - m7_tumbling : 5-minute tumbling count/sum per event_type
  *  - m8_sliding  : 10-minute windows sliding every 5 (each row in exactly
  *                  2 windows — the oracle reproduces the grid with an
  *                  offset cross join)
  *  - m9_session  : 30-minute-gap sessions per user (the engine analogue
  *                  of q10's log sessionization, computed by
  *                  `session_window` instead of a lag/cumsum window)
  *  - q12_asof    : as-of join — latest prior purchase per click, via
  *                  [[graft.operators.AsOfJoin]] (DuckDB ASOF JOIN oracle)
  */
object TimeSeriesQueries {

  /** Second-granularity event time on both engines (see QUtil doc). */
  private def tsSec = timestamp_seconds(tsec(col("ts")))

  val queries: Map[String, QFn] = Map(
    "m7_tumbling" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), asDouble(sum(dec2(col("value")))).as("sum_value"))
        .select(tsec(col("w.start")).as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },

    "m8_sliding" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), asDouble(sum(dec2(col("value")))).as("sum_value"))
        .select(tsec(col("w.start")).as("w_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("w_start", "event_type")
    },

    // session_window computes on event time directly; truncate to seconds
    // first so gap decisions agree with the second-granularity oracle.
    "m9_session" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(tsSec, "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"), asDouble(sum(dec2(col("value")))).as("sum_value"))
        .select(col("user_id"), tsec(col("w.start")).as("s_start"),
          tsec(col("w.end")).as("s_end"), col("n"), col("sum_value"))
        .orderBy("user_id", "s_start")
    },

    // As-of join (q12): each click picks up the latest prior purchase
    // value of the same user — the canonical temporal enrichment (quotes
    // to trades, config to metrics). Times are microsecond epoch longs on
    // both sides: DuckDB reads the TIMESTAMP(NANOS) parquet truncated to
    // µs, so Spark's raw ns longs are divided down to match. The purchase
    // side is pre-aggregated per (user, t) because as-of semantics need a
    // unique right row per instant (see AsOfJoin contract). Plan shape
    // pinned: one exchange on user_id, no nested-loop join.
    "q12_asof" -> { (s, dir) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("t", expr("ts div 1000")) // ns → µs (integer division)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "t")
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "t").agg(max("value").as("pval"))
      graft.operators.AsOfJoin.backward(
          clicks, purchases, Seq("user_id"),
          leftTime = "t", rightTime = "t", rightVals = Seq("pval"))
        .select(col("event_id"), col("user_id"), col("t"),
          col("pval").as("last_purchase"))
        .orderBy("event_id")
    }
  )

  private val t = duckTsec("ts")

  val oracles: Map[String, String] = Map(
    "m7_tumbling" ->
      s"""SELECT ($t) // 300 * 300 AS w_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // every event lies in the two 600s windows starting at
    // floor(t/300)*300 and floor(t/300)*300 - 300
    "m8_sliding" ->
      s"""SELECT w_start, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT ($t) // 300 * 300 - g.off AS w_start, event_type, value
        |  FROM events, (VALUES (0), (300)) AS g(off))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // gap-based sessionization (lag + cumsum), Spark session_window
    // semantics: start = first event, end = last event + gap
    "m9_session" ->
      s"""WITH pts AS (
        |  SELECT user_id, ($t) AS t, value FROM events),
        |marked AS (
        |  SELECT *, CASE WHEN t - LAG(t) OVER w > 1800 OR
        |    LAG(t) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |sess AS (
        |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM marked)
        |SELECT user_id, MIN(t) AS s_start, MAX(t) + 1800 AS s_end,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,

    "q12_asof" ->
      """SELECT c.event_id, c.user_id, c.t, p.pval AS last_purchase
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS t FROM events
        |      WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS t,
        |                  MAX(value) AS pval
        |                FROM events WHERE event_type = 'purchase'
        |                GROUP BY 1, 2) p
        |  ON c.user_id = p.user_id AND p.t <= c.t
        |ORDER BY event_id""".stripMargin
  )
}
