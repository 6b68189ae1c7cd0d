package graft

import org.apache.spark.sql.SparkSession

/** One session builder for every graft entry point (VERDICT r16 #3).
  *
  * Through r16 the execution-environment fixes — the serialized sort
  * shuffle writer below the bypass threshold and the no-fork local
  * filesystem — lived only in Bench's (and partially PlanDump's) session
  * builders, so Verify and any library session still forked /bin/chmod
  * per directory and used the bypass writer. Harmless for correctness,
  * but it meant the timed configuration and the correctness-checked
  * configuration diverged (ADVICE r16). This helper owns every
  * cross-entry-point config; callers add only their deliberate
  * differences:
  *
  *  - Bench/PlanDump add the RocksDB state-store provider (production
  *    streaming config; PlanDump must match Bench so committed plans are
  *    the measured plans).
  *  - Verify keeps the DEFAULT state-store provider on purpose: the
  *    oracle gate then covers the HDFS-backed provider path while Bench
  *    covers RocksDB (parity between the two is pinned in StreamingSpec).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      // scale-adaptive on a cluster this would come from the site config;
      // locally the core count is the right gate-scale default and the
      // driver's bench contract (SPARK_GRAFT_CPUS) feeds it
      .config("spark.sql.shuffle.partitions", cpus)
      // always use the serialized sort shuffle writer (r16, guide §2.2):
      // below the 200-partition default threshold the bypass writer
      // creates, maps and concatenates one file PER REDUCE PARTITION per
      // map task — stack-sampled as the top executor frames across the
      // l-family at gate scale. Any production shuffle (>200 partitions)
      // already takes the sort-writer path, so this makes the gate-scale
      // writer match the at-scale one; scale-invariant by construction.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      // in-process chmod for file:// writes (r16): without libhadoop,
      // RawLocalFileSystem forks /bin/chmod per directory/file on every
      // local write. The subclass sets the identical mode bits via NIO;
      // HDFS/S3 paths never touch it. See graft.engine.NoForkLocalFs.
      .config("spark.hadoop.fs.file.impl",
        "graft.engine.NoForkLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.engine.NoForkLocalFs")
      .config("spark.sql.session.timeZone", "UTC")
      // q37's recursive sessionization: depth = max session length, which
      // the default limit (100) could cap on denser-than-testdata corpora
      .config("spark.sql.cteRecursionLevelLimit", "10000")
      .config("spark.ui.enabled", "false")
}
