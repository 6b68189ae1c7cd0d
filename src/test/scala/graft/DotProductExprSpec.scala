package graft

import org.apache.spark.sql.functions._

import graft.functions.DotProduct

class DotProductExprSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0), 32.0),
    (Array(0.5, -0.5), Array(2.0, 2.0), 0.0),
    (Array.empty[Double], Array.empty[Double], 0.0),
    (Array(1e-300, 1e300), Array(1e300, 1e-300), 2.0))

  test("dot_product matches a sequential left fold") {
    val df = pairs.map(p => (p._1, p._2)).toDF("a", "b")
    val got = df.select(DotProduct(col("a"), col("b"))).as[Double].collect()
    assert(got.toSeq == pairs.map(_._3))
  }

  test("codegen and interpreted paths agree; SQL registration works") {
    val df = pairs.map(p => (p._1, p._2)).toDF("a", "b")
    val on = df.select(DotProduct(col("a"), col("b"))).as[Double].collect().toSeq
    val off = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try df.select(DotProduct(col("a"), col("b"))).as[Double].collect().toSeq
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(on == off)
    DotProduct.register(spark)
    val sql = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0)
    assert(sql == 11.0)
  }

  test("null inputs yield null; non-double arrays are rejected") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(DotProduct(col("a"), col("b"))).head().isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1), Array(2))).toDF("a", "b")
        .select(DotProduct(col("a"), col("b"))).collect()
    }
  }
}
