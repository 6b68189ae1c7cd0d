package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution sketches whose results are pure deterministic functions of
  * the data — the property every oracle-gated operator here depends on
  * (the KMV distinct sketch in [[graft.llm.TextStats.kmvDistinct]] is the
  * cardinality member of the family).
  *
  * Spark's own `approxQuantile` (Greenwald-Khanna) and DuckDB's
  * `approx_quantile` (t-digest) could never hash-agree, and q7's exact
  * `percentile` needs a full per-group sort of the values — fine at gate
  * scale, not the plan you want for a 100 TB column. The fixed-grid
  * histogram is the classic scale answer: two linear passes, a
  * bins-per-group-bounded state, mergeable across executors by integer
  * bin-count addition, and an error bound that is a STATEMENT about the
  * grid ((hi−lo)/bins), not about luck. */
object Sketches {

  /** Histogram-quantile sketch: per group, quantile estimates of `valCol`
    * from a fixed `bins`-cell grid spanning [min, max].
    *
    * Pass 1 aggregates (n, lo, hi) per group (partial map-side, one
    * group-count-sized result, broadcast back). Pass 2 bins every value —
    * `bin = floor((v − lo) / ((hi − lo) / bins))` clamped to the last cell
    * so v = hi lands inside — and partial-aggregates bin counts, so the
    * one corpus-sized shuffle moves ≤ groups·bins rows. The cumulative
    * count then runs a window over ≤ `bins` rows per group (bounded state,
    * never a funnel), and quantile q reports the UPPER boundary of the
    * first bin whose cumulative count reaches `ceil(q·n)`:
    * `lo + (bin+1)·(hi−lo)/bins`, which over-estimates by at most one bin
    * width — the sketch's documented error contract. Every arithmetic step
    * is the identical IEEE sequence on both engines, so estimates are
    * bit-reproducible, and a degenerate group (hi = lo) reports lo for
    * every quantile.
    *
    * Output: group, n, lo, hi, one `est_p<q>` column per requested
    * quantile. */
  def histQuantile(points: DataFrame, groupCol: String, valCol: String,
      qs: Seq[Double] = Seq(0.5, 0.9, 0.99), bins: Int = 128): DataFrame = {
    require(bins >= 2 && qs.nonEmpty && qs.forall(q => q > 0 && q <= 1))
    val stats = points.groupBy(groupCol).agg(
      count(lit(1)).as("n"), min(valCol).as("lo"), max(valCol).as("hi"))
    val width = (col("hi") - col("lo")) / lit(bins.toDouble)
    val binned = points
      .join(broadcast(stats), groupCol)
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col(valCol) - col("lo")) / width),
            lit((bins - 1).toLong))))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as("c"))
    val cum = binned
      .withColumn("cum", sum("c").over(
        Window.partitionBy(groupCol).orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(stats), groupCol)
    val estCols = qs.map { q =>
      val label = "est_p" + (q * 100).round.toString
      min(when(col("cum") >= ceil(lit(q) * col("n").cast("double")),
        col("lo") + (col("bin") + 1) * width)).as(label)
    }
    cum.groupBy(groupCol, "n", "lo", "hi")
      .agg(estCols.head, estCols.tail: _*)
      .orderBy(groupCol)
  }
}
