package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Input-density probe for the maintainer family's shared pair graph
  * (m37/m41 consume `TextDedup.minhashNearDup(documents)` as their edge
  * stream). Prints one JSON line: edges = pair rows, wedges =
  * Σ d(v)·(d(v)−1)/2 — the same arithmetic Bench's `density_q` records
  * for queries that RUN (Bench.scala `priceDensity`).
  *
  * Exists for the decade where a maintainer CANNOT be timed: at ×1000 the
  * replicated corpus's identical-doc cliques give m41 a wedge workload
  * ~1000× its ×100 load (wedges ∝ F³ per clique), so the ×1000 registry
  * net excludes it (SPARK_GRAFT_EXCLUDE) and prices it instead —
  * projected wall = measured ×1000 wedges × the ×100 run's ns-per-wedge
  * (BENCH_SCALE §r16). A priced exclusion needs a MEASURED numerator;
  * this main is that measurement, run untimed outside any bench window.
  *
  * Usage: runMain graft.DensityProbe <sfDir>
  */
object DensityProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val e = graft.llm.TextDedup.minhashNearDup(Tables.documents(spark, dir))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val edges = e.count()
    val wedges = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy("n").count()
      .agg(expr("CAST(sum((count * (count - 1)) DIV 2) AS LONG)"))
      .head().getLong(0)
    e.unpersist()
    val dirJ = new java.io.File(dir).getCanonicalPath
      .replace("\\", "\\\\").replace("\"", "\\\"")
    println(f"""{"probe":"minhash_pair_graph","dir":"$dirJ","edges":$edges,"wedges":$wedges,"probe_wall_sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    spark.stop()
  }
}
