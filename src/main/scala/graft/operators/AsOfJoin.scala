package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for each left row, the single right row with
  * the greatest right-time <= left-time in the same key group (pandas
  * `merge_asof`, kdb `aj`, DuckDB `ASOF JOIN` semantics; the reference
  * engine's analogue is the per-topic "state as of a cutoff" read,
  * unitdb db.go:222-319 `?last=` resolution).
  *
  * Spark has no native as-of join; the naive formulations both fail at
  * scale — a non-equi join plans as BroadcastNestedLoopJoin (quadratic,
  * and one side must fit in memory), and a per-left-row subquery probe
  * is quadratic too. This is the sort-merge formulation instead: union
  * the two sides, ONE shuffle+sort on (key, time, side), and a running
  * `last(ignoreNulls)` window carries the most recent right payload
  * forward into each left row. Cost is the same single exchange a plain
  * equi-join would pay; no broadcast requirement on either side; memory
  * per task is O(1) beyond the sort (rowsBetween running frame, no
  * whole-group buffering).
  *
  * Skew: the running window is inherently sequential per key, so one
  * pathologically hot key serializes into one task. That is intrinsic to
  * as-of ordering (each row depends on the previous); if a key is that
  * hot, range-bucket the time axis upstream and as-of join per bucket
  * with boundary carry-in.
  *
  * Contract: `right` must be unique per (keys, rightTime) — otherwise
  * "the latest right row" is ambiguous in any engine (DuckDB ASOF picks
  * an arbitrary one of the tied rows). Pre-aggregate to enforce it.
  */
object AsOfJoin {

  /** Backward as-of join (the common direction): latest right row with
    * `rightTime <= leftTime`. Left rows with no prior right row keep
    * nulls in the right-value columns.
    *
    * @param keys      equality key columns (present on both sides)
    * @param leftTime  left ordering column name (numeric or timestamp)
    * @param rightTime right ordering column name (same type as leftTime)
    * @param rightVals right columns to attach to each left row
    * @param tolerance optional maximum age `leftTime - rightTime` (same
    *                  numeric units as the time columns; numeric times
    *                  only): older matches become nulls, like pandas
    *                  merge_asof(tolerance=...)
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, rightVals, tolerance,
      forward = false)

  /** Forward as-of join: earliest right row with `rightTime >= leftTime`
    * (tolerance bounds `rightTime - leftTime`). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    asof(left, right, keys, leftTime, rightTime, rightVals, tolerance,
      forward = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      tolerance: Option[Long], forward: Boolean): DataFrame = {
    require(rightVals.nonEmpty, "rightVals must name at least one column")
    val outCols = left.columns.toSeq
    val clash = rightVals.filter(outCols.contains)
    require(clash.isEmpty,
      s"right value columns ${clash.mkString(", ")} collide with left columns")

    // right payload rides in one struct (carrying its own time for the
    // tolerance check); the left side contributes a null struct
    val rv = struct(
      (col(rightTime).as("__rt") +: rightVals.map(col)): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__t") :+ rv.as("__rv")): _*)
      .withColumn("__side", lit(1))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    // at equal time, right sorts before left so the match is inclusive;
    // forward = the same running-last trick over reversed time order
    val ord =
      if (forward) Seq(col("__t").desc, col("__side").desc)
      else Seq(col("__t").asc, col("__side").desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)

    val withTol = tolerance match {
      case Some(tol) =>
        val age =
          if (forward) col("__m.__rt") - col("__t")
          else col("__t") - col("__m.__rt")
        matched.withColumn("__m", when(age <= tol, col("__m")))
      case None => matched
    }
    withTol.select(
      (outCols.map(col) ++ rightVals.map(v => col(s"__m.$v").as(v))): _*)
  }
}
