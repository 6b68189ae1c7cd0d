package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-only scale-up generator: replicate the driver testdata F× with
  * key-shifted copies, so shuffle/join shapes can be measured beyond the
  * largest provided SF (r2 VERDICT #7 — the 600k-row sf0.1 can't surface
  * shuffle-shape regressions). Fact-table keys (and their FK columns) are
  * shifted by a per-copy stride so referential integrity and key
  * uniqueness hold; dimension tables (region, nation) stay fixed, like
  * TPC-H itself. Correctness runs NEVER use this data — the DuckDB oracle
  * gate stays on the driver's own parquet; this exists purely to time the
  * same plans at 10× the rows.
  *
  * Usage: runMain graft.ScaleData <inDir> <outDir> <factor> [tables]
  * `tables` (optional, comma-separated) restricts generation to a subset —
  * the streaming-state probe only reads `events`, so its ×1000 decade
  * doesn't have to materialize 600M lineitem rows it never scans.
  */
object ScaleData {

  /** Per-copy key stride — far above any real key at any plausible SF. */
  val Stride = 100000000L

  /** Key/FK columns to shift per table; dims map to Nil and are copied
    * once. `events.ts` stays as raw nanos (BIGINT under nanosAsLong) —
    * Tables.events handles both encodings. */
  val shiftCols: Map[String, Seq[String]] = Map(
    "customer"   -> Seq("c_custkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part"       -> Seq("p_partkey"),
    "supplier"   -> Seq("s_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation"     -> Nil,
    "region"     -> Nil)

  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    val only: Set[String] = args.lift(3) match {
      case Some(csv) =>
        val t = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val unknown = t -- shiftCols.keySet
        require(unknown.isEmpty, s"unknown tables: ${unknown.mkString(",")}")
        t
      case None => shiftCols.keySet
    }
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    shiftCols.view.filterKeys(only).foreach { case (name, keys) =>
      val src = spark.read.parquet(s"$inDir/$name.parquet")
      val copies = if (keys.isEmpty) 1 else factor
      val out = (0 until copies).map { i =>
        keys.foldLeft(src) { (df, k) =>
          df.withColumn(k, col(k) + lit(i * Stride))
        }
      }.reduce(_ unionByName _)
      if (name == "events") {
        // the engine queries stream-source events with
        // pathGlobFilter=events.parquet, which matches a FILE of that
        // name, not part files inside a directory — write one part and
        // move it up as a plain file, like the driver's own testdata
        val tmp = s"$outDir/.events_tmp"
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = java.nio.file.Paths.get(s"$outDir/$name.parquet")
        org.apache.commons.io.FileUtils.deleteQuietly(dst.toFile): Unit
        java.nio.file.Files.move(part.toPath, dst)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      } else
        out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scale] $name x$copies")
    }
    spark.stop()
  }
}
