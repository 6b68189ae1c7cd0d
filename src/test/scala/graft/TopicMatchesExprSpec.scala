package graft

import org.apache.spark.sql.functions._

import graft.functions.TopicMatches
import graft.model.Topic

class TopicMatchesExprSpec extends SparkSpec {
  import spark.implicits._

  val topics = Seq(
    "unit.b.b1", "unit.b.b1.b11", "unit.b",
    "unit.b.b1.b11.b111.b1111.b11111.b111111",
    "teams.alpha.ch1", "teams.beta.ch1", "teams.alpha.ch2",
    "unit.b...", "unit.*.b1.b11.*.*.b11111.*", "..."
  )

  test("expression agrees with pure-Scala matcher for all pairs") {
    val df = topics.toDF("topic")
    for (pat <- topics) {
      val got = df.filter(TopicMatches(col("topic"), lit(pat)))
        .as[String].collect().toSet
      val want = topics.filter(t => Topic.matches(t, pat)).toSet
      assert(got == want, s"pattern $pat")
    }
  }

  test("topic_parts_matches agrees with the string matcher (no per-row parse)") {
    val rows = topics.map { t => val p = Topic.parse(t); (t, p.parts, p.multi) }
    val df = rows.toDF("topic", "parts", "multi")
    for (pat <- topics) {
      val got = df.filter(graft.functions.TopicPartsMatches(
          col("parts"), col("multi"), Topic.parse(pat).key))
        .select("topic").as[String].collect().toSet
      val want = topics.filter(t => Topic.matches(t, pat)).toSet
      assert(got == want, s"pattern $pat")
    }
  }

  test("codegen and interpreted paths agree") {
    val df = topics.toDF("topic")
    val pat = "unit.*.b1..."
    val on = df.filter(TopicMatches(col("topic"), lit(pat))).count()
    val off = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try df.filter(TopicMatches(col("topic"), lit(pat))).count()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
    assert(on == off)
  }

  test("SQL registration") {
    TopicMatches.register(spark)
    topics.toDF("topic").createOrReplaceTempView("topics_v")
    val n = spark.sql(
      "SELECT count(*) c FROM topics_v WHERE topic_matches(topic, 'teams.*.ch1')"
    ).as[Long].head()
    assert(n == 3) // teams.alpha.ch1, teams.beta.ch1, and stored '...'
  }

  test("malformed topics match nothing instead of failing the job") {
    val df = Seq("a..b", "", "a.b").toDF("topic")
    val got = df.filter(TopicMatches(col("topic"), lit("a.*"))).as[String].collect()
    assert(got.toSeq == Seq("a.b"))
    // malformed pattern matches nothing, also without aborting
    assert(df.filter(TopicMatches(col("topic"), lit("x..y"))).count() == 0)
  }

  test("null semantics") {
    val df = Seq(Some("a.b"), None).toDF("topic")
    val n = df.filter(TopicMatches(col("topic"), lit("a.*"))).count()
    assert(n == 1)
  }
}
