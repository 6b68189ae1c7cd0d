package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.llm.TextStats
class ScratchDebugSpec extends SparkSpec {
  test("profile l63 pieces at sf0.1") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val w0 = split(col("text"), " ")
    val grams = when(size(w0) >= 3,
      transform(sequence(lit(0), size(w0) - 3),
        i => concat_ws(" ", slice(w0, i + 1, lit(3))))).otherwise(array())
    val dist = docs.repartition(32)
      .select(col("source"), explode(grams).as("g"))
      .select(col("source"), md5(col("g")).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("dist.count")(dist.count())
    val k = 256
    val w1 = Window.partitionBy(col("source"), col("__pid")).orderBy(col("h"))
    val w2 = Window.partitionBy(col("source")).orderBy(col("h"))
    val minima = dist
      .withColumn("__pid", spark_partition_id())
      .withColumn("__r1", row_number().over(w1)).filter(col("__r1") <= k)
      .withColumn("__rk", row_number().over(w2)).filter(col("__rk") <= k)
      .select(col("source"), col("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("minima.count")(minima.count())
    val exact = dist.as("da").join(dist.as("db"),
        col("da.h") === col("db.h") && col("da.source") < col("db.source"))
      .groupBy(col("da.source").as("source_a"), col("db.source").as("source_b"))
      .agg(count(lit(1)).as("n_exact_inter"))
    t("exact.count")(exact.count())
    val dist2 = docs.repartition(32)
      .select(col("source"), split(col("text"), " ").as("w0m"))
      .select(col("source"), explode(when(size(col("w0m")) >= 3,
        transform(sequence(lit(0), size(col("w0m")) - 3),
          i => concat_ws(" ", slice(col("w0m"), i + 1, lit(3))))).otherwise(array())).as("g"))
      .select(col("source"), md5(col("g")).as("h"))
      .distinct()
    t("dist2.count")(dist2.count())
    t("dist2.count.again")(dist2.count())
    t("full")(TextStats.kmvSetOps(docs).collect())
  }
}
