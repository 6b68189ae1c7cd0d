package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit two-level aggregation for skew-prone aggregates whose STATE is
  * heavy — the cases map-side partial aggregation cannot save:
  *
  * Plain sums/counts never need salting in Spark (partial aggregation
  * already combines per-task before the shuffle — a billion-row hot key
  * arrives at the reducer as one partial per task). What DOES funnel is a
  * per-key aggregate with per-VALUE state, the canonical one being
  * `COUNT(DISTINCT v)`: the single-pass plan must materialize every
  * distinct v of a key in one task. Spark's built-in distinct-agg expand
  * helps, but the explicit two-level form is the shape that survives any
  * skew: bucket the DISTINCT COLUMN by hash into `buckets` sub-keys,
  * dedupe/count within (key, bucket) — each bucket holds a disjoint slice
  * of the key's value space, so no task ever sees more than ~1/buckets of
  * the hottest key's distinct values — then sum the per-bucket counts,
  * which is a trivially partial-aggregable second pass over buckets×keys
  * rows. Both exchanges are integer-exact, so the result equals the
  * single-level form bit-for-bit.
  *
  * The same scaffold (`withBuckets`) serves any decomposable heavy-state
  * aggregate: sketch-per-bucket-then-merge, collect-then-merge, etc.
  */
object SkewAgg {

  /** `COUNT(DISTINCT distinctCol) GROUP BY keys`, hardened for hot keys:
    * phase 1 counts distinct within (keys, hash-bucket of the distinct
    * column), phase 2 sums bucket counts. Equal values always land in
    * the same bucket, so the bucket counts partition the distinct set
    * and their sum is exact. */
  def saltedDistinctCount(
      df: DataFrame,
      keys: Seq[String],
      distinctCol: String,
      buckets: Int,
      out: String): DataFrame = {
    val keyCols = keys.map(col)
    df
      .withColumn("__bkt", pmod(hash(col(distinctCol)), lit(buckets)))
      .groupBy(keyCols :+ col("__bkt"): _*)
      .agg(countDistinct(col(distinctCol)).as("__n"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__n")).as(out))
  }

  /** Hash-bucket column for hand-rolled two-level plans over `df`:
    * deterministic (value-derived, not partition-derived), so replays
    * and the oracle agree. */
  def withBuckets(df: DataFrame, saltFrom: Column, buckets: Int,
      bucketCol: String = "__bkt"): DataFrame =
    df.withColumn(bucketCol, pmod(hash(saltFrom), lit(buckets)))
}
