package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: align irregular per-series observations onto a
  * fixed time grid, filling gaps by last-observation-carried-forward — the
  * TSDB "resample + fill(previous)" every monitoring query language has
  * (the reference's 1-second ingest time-blocks, memdb/tiny_log.go:122-128,
  * are its native sampling grain; this is the query-side generalization).
  *
  * Scale shape (100 TB):
  *  - The grid is built ONCE from a 1-row global bounds aggregate and
  *    broadcast: `sequence(lo, hi, step)` explodes span/step rows (a
  *    2-year second-grid is ~6×10⁷ longs — broadcastable; a coarser step
  *    at that span is pennies). The big side — the series keys — stays
  *    distributed: `keys × broadcast(grid)` never shuffles the corpus.
  *  - The observed points join the dense grid on (series, bucket): one
  *    hash-partitioned shuffle of each, co-partitioned by construction.
  *  - LOCF is one window per series ordered by bucket — state is a single
  *    value per series, tasks scale with series count, and no task ever
  *    holds more than one series' grid (the per-series grid is bounded by
  *    span/step, not by corpus size).
  */
object Resample {

  /** Dense (series × grid) frame with LOCF-filled values.
    *
    * `points` must carry `keys`, a long epoch-seconds bucket column
    * `timeCol` already aligned to `stepSec` multiples (one row per
    * (series, bucket) — pre-aggregate first), and `valCols`. Output has
    * one row per (series, grid bucket) from the global min to max bucket:
    * each value column LOCF-filled (leading gaps stay null), plus
    * `filled` = true on gap rows. Counts and similar gauge-resettable
    * columns belong in `zeroCols` — gaps get 0, not the carried value. */
  def gridLocf(
      points: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valCols: Seq[String],
      stepSec: Long,
      zeroCols: Seq[String] = Nil): DataFrame = {
    val bounds = points.agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
    val grid = bounds
      .select(explode(sequence(col("__lo"), col("__hi"), lit(stepSec))).as(timeCol))
    val series = points.select(keys.map(col): _*).distinct()
    val dense = series.crossJoin(broadcast(grid))
    val joined = dense.join(points, keys :+ timeCol, "left")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val anyVal: Column = valCols.map(c => col(c).isNotNull).reduce(_ || _)
    val locfed = valCols.foldLeft(joined.withColumn("__obs", anyVal)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val zeroed = zeroCols.foldLeft(locfed) {
      (df, c) => df.withColumn(c, coalesce(col(c), lit(0L)))
    }
    zeroed
      .withColumn("filled", !coalesce(col("__obs"), lit(false)))
      .drop("__obs")
  }

  /** Dense (series × grid) frame with LINEAR interpolation — the
    * "fill(linear)" sibling of [[gridLocf]]: each gap bucket gets the
    * straight-line value between the nearest observation before and after
    * it; leading/trailing gaps (no surrounding pair) stay null.
    *
    * Same scale shape as [[gridLocf]] (broadcast grid, one shuffle on the
    * series key). Both directional windows share the one (series, bucket)
    * sort, so the whole fill is a single exchange + window stage.
    *
    * Determinism: the interpolation is written as
    * `vp + (vn - vp) * (CAST(h - hp AS DOUBLE) / (hn - hp))` — integer
    * bucket deltas, one IEEE divide, one multiply, one add, in that
    * exact association on both engines, so the oracle reproduces every
    * bit. Observation rows pass their value through untouched (the
    * directional windows both anchor on the row itself there, which
    * would make the fraction 0/0). */
  def gridInterp(
      points: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valCol: String,
      stepSec: Long): DataFrame = {
    val bounds = points.agg(min(col(timeCol)).as("__lo"), max(col(timeCol)).as("__hi"))
    val grid = bounds
      .select(explode(sequence(col("__lo"), col("__hi"), lit(stepSec))).as(timeCol))
    val series = points.select(keys.map(col): _*).distinct()
    val dense = series.crossJoin(broadcast(grid))
    val joined = dense.join(points, keys :+ timeCol, "left")
    val wPrev = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsT = when(col(valCol).isNotNull, col(timeCol))
    joined
      .withColumn("__vp", last(col(valCol), ignoreNulls = true).over(wPrev))
      .withColumn("__hp", last(obsT, ignoreNulls = true).over(wPrev))
      .withColumn("__vn", first(col(valCol), ignoreNulls = true).over(wNext))
      .withColumn("__hn", first(obsT, ignoreNulls = true).over(wNext))
      .withColumn("filled", col(valCol).isNull)
      .withColumn(valCol,
        when(col(valCol).isNotNull, col(valCol))
          .when(col("__vp").isNotNull && col("__vn").isNotNull,
            col("__vp") + (col("__vn") - col("__vp")) *
              ((col(timeCol) - col("__hp")).cast("double") /
                (col("__hn") - col("__hp")))))
      .drop("__vp", "__hp", "__vn", "__hn")
  }

  /** Per-series discrete derivative — the monitoring `rate()`/`delta()`
    * over a gauge: for each observation, the change in value and time
    * since the previous observation of the SAME series, and the implied
    * per-second rate (null on each series' first point and on zero/
    * negative time steps, where a rate is undefined).
    *
    * One window per series ordered by (time, tiebreak): a single shuffle
    * on the series key, constant state per series — the same shape at any
    * corpus size. `timeCol` is a long in `perSecond`-units-per-second
    * (e.g. µs with perSecond = 1e6). */
  def rate(
      points: DataFrame,
      keys: Seq[String],
      timeCol: String,
      valCol: String,
      tiebreak: String,
      perSecond: Double = 1e6): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col(tiebreak))
    points
      .withColumn("dv", col(valCol) - lag(col(valCol), 1).over(w))
      .withColumn("dt", col(timeCol) - lag(col(timeCol), 1).over(w))
      .withColumn("rate",
        when(col("dt") > 0, col("dv") * lit(perSecond) / col("dt")))
  }
}
