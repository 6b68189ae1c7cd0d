package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout for the driver.
  *
  * Methodology (VERDICT r1 #5): every query is materialized through the
  * `noop` sink, which evaluates all columns of every row (unlike `count()`,
  * under which Catalyst prunes columns and may drop sorts entirely), and a
  * warmup query absorbs JVM/codegen/parquet-footer first-touch cost so the
  * first measured query isn't blamed for it. Queries run in sorted-name
  * order for reproducibility.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // warmup: touch the big tables + exercise codegen, unmeasured. The
    // sf0.001 s1 pass additionally absorbs Structured Streaming + engine
    // write-path first-touch (checkpoint machinery, foreachBatch codegen,
    // parquet committer classes) — r4's driver run showed the tail s1/s2
    // queries paying multi-second one-time costs that belong to the JVM,
    // not the query.
    try run(SparkEntry.queries("q1_agg")) catch { case _: Throwable => }
    try run(SparkEntry.queries("q3_join")) catch { case _: Throwable => }
    try SparkEntry.queries("s1_engine_roundtrip")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }
    spark.catalog.clearCache()

    // optional args = subset of query names (local iteration; the driver
    // passes none and measures everything)
    val wanted = if (args.isEmpty) SparkEntry.queries
                 else SparkEntry.queries.filter(kv => args.contains(kv._1))
    val results = wanted.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query must be VISIBLE — a swallowed failure reads as a
      // fast query and quietly corrupts the trend line
      try run(fn) catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // leftover cached blocks from one query must not tax the next
      // (each query's own caching cost is inside its measured time;
      // the clear itself is untimed bookkeeping)
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
