package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location: pay a join's shuffle ONCE at write time.
  *
  * At 100 TB the dominant cost of a fact–fact join is the exchange of both
  * sides. Spark's bucketing amortizes it: `bucketBy(n, key)` hash-splits
  * each side into the same n buckets at write time, and a later equi-join
  * on the bucket key sort-merges bucket-to-bucket with NO Exchange on
  * either side (`BucketJoinSpec` pins the zero-exchange plan). The write
  * itself shuffles — but once, not per downstream query, which is the
  * right trade for tables joined repeatedly (the reference pays the same
  * cost shape with its static per-topic block placement: co-locate at
  * write time, read aligned — unitdb.go:142-180 block assignment).
  *
  * Bucket count is a real scale lever: n must be chosen for the TARGET
  * size (100 TB / n ≤ an executor's comfortable task input, so n in the
  * tens of thousands), because unlike shuffle partitions AQE cannot
  * re-split a bucket at read time. Both sides must use the SAME n — a
  * mismatch silently reintroduces the exchange on one side.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and in-file sorted)
    * by `key` into database `db` (created at `location` if absent).
    * In-file sort keeps each bucket range-readable so the merge join's
    * per-task sort is a near-no-op on 1-file buckets. */
  def writeBucketed(df: DataFrame, db: String, table: String, key: String,
                    buckets: Int, location: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$location'")
    // repartition on the key with the bucket count: Spark's bucket id and
    // its shuffle partitioning share the Murmur3 hash, so every write task
    // holds exactly one bucket's rows → ONE file per bucket (without this,
    // each input partition writes a file into every bucket: P×n small
    // files, and the read side loses the per-bucket sort guarantee).
    df.repartition(buckets, df.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(s"$db.$table")
  }

  /** Equi-join two tables bucketed on `key` with the same bucket count.
    * The MERGE hint pins SortMergeJoin (bucket-aligned, exchange-free)
    * even when one side would fit a broadcast at test scale — at the
    * design scale both sides are fact-sized and SMJ is the only shape. */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
                 key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), key)
}
