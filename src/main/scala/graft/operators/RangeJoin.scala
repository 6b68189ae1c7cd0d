package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match points to the intervals containing them,
  * `lo <= point < hi`, optionally under extra equality keys.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin: one
  * side must fit in memory and every point compares against every
  * interval — O(N·M) and undistributable on the big side. Binning makes
  * it an equi-join: quantize the number line into fixed-width bins, an
  * interval materializes one row per bin it overlaps, a point exactly
  * one, and the bin id becomes a shuffle key both sides hash on. The
  * residual `lo <= p < hi` filter runs post-join on candidate pairs
  * only. Cost: one shuffle of |points| + Σ(interval_len/binWidth) rows —
  * linear, AQE-skew-splittable, no broadcast requirement.
  *
  * Pick `binWidth` near the median interval length: much wider means
  * bins collect unrelated intervals (more residual-filtered pairs), much
  * narrower means long intervals explode into many rows. Both are
  * correct; only candidate volume moves.
  *
  * Interval×interval overlap joins reduce to this: explode ONE side into
  * bins (this helper's interval side), keep the other as its lo-point,
  * and widen the residual to the overlap predicate.
  */
object RangeJoin {

  /** Join each point row to every interval row whose [lo, hi) contains
    * its point value (plus `keys` equalities). Output = point columns ++
    * interval columns (names must not clash apart from `keys`). */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = intervals.columns.toSet
      .intersect(points.columns.toSet) -- keys.toSet
    require(clash.isEmpty,
      s"point/interval columns ${clash.mkString(", ")} clash outside the join keys")

    val ivBins = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    val ptBins = points.withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    ptBins.join(ivBins, keys :+ "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }

  /** Join interval rows whose half-open spans overlap:
    * `lLo < rHi && rLo < lHi` (plus `keys` equalities) — concurrency /
    * co-occurrence joins (overlapping sessions, colliding reservations,
    * genomic ranges).
    *
    * Same binning reduction as [[pointInInterval]], with BOTH sides
    * exploded; a pair sharing several bins would surface once per shared
    * bin, so each pair is emitted only in its canonical bin — the bin of
    * the overlap's own start, `floor(max(lLo, rLo) / binWidth)` — which
    * every overlapping pair shares by construction. No `distinct`, no
    * post-hoc dedup shuffle: the equi-join on the bin id is the only
    * exchange, linear in Σ(span/binWidth), and AQE-skew-splittable. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      binWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val clash = left.columns.toSet
      .intersect(right.columns.toSet) -- keys.toSet
    require(clash.isEmpty,
      s"left/right columns ${clash.mkString(", ")} clash outside the join keys")

    def bins(df: DataFrame, lo: String, hi: String) = df.withColumn("__bin",
      explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    bins(left, lLo, lHi).join(bins(right, rLo, rHi), keys :+ "__bin")
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .filter(col("__bin") ===
        floor(greatest(col(lLo), col(rLo)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
