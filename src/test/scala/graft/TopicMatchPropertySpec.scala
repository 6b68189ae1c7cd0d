package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{TopicMatches, TopicPartsMatches}
import graft.model.Topic

/** Randomized (seeded, deterministic) property coverage of the wildcard
  * matcher — the golden vectors pin the reference behavior
  * (db_test.go:288-318); these pin the algebra on 1000 generated pairs. */
class TopicMatchPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private val alphabet = Vector("a", "b", "c", "ab", "bc")

  private def randomTopic(wildcards: Boolean): String = {
    val depth = 1 + rnd.nextInt(5)
    val parts = Vector.fill(depth) {
      if (wildcards && rnd.nextInt(4) == 0) "*"
      else alphabet(rnd.nextInt(alphabet.size))
    }
    val multi = wildcards && rnd.nextInt(5) == 0
    parts.mkString(".") + (if (multi) "..." else "")
  }

  private val statics = Vector.fill(300)(randomTopic(wildcards = false))
  private val mixed = Vector.fill(300)(randomTopic(wildcards = true))

  test("static/static match iff equal; every topic matches itself") {
    for (_ <- 1 to 1000) {
      val a = statics(rnd.nextInt(statics.size))
      val b = statics(rnd.nextInt(statics.size))
      assert(Topic.matches(a, b) == (a == b), s"$a vs $b")
    }
    for (t <- mixed) assert(Topic.matches(t, t), s"$t should match itself")
  }

  test("matching is symmetric (wildcards work on either side)") {
    for (_ <- 1 to 1000) {
      val a = mixed(rnd.nextInt(mixed.size))
      val b = mixed(rnd.nextInt(mixed.size))
      assert(Topic.matches(a, b) == Topic.matches(b, a), s"$a vs $b")
    }
  }

  test("a '...' extension of any pattern matches everything the base matched") {
    for (_ <- 1 to 500) {
      val base = statics(rnd.nextInt(statics.size))
      val widened = base + "..."
      for (t <- statics.take(50))
        if (Topic.matches(t, base))
          assert(Topic.matches(t, widened), s"$t: $base widened to $widened")
    }
  }

  test("replacing one level with '*' only widens the match set") {
    for (_ <- 1 to 500) {
      val pat = statics(rnd.nextInt(statics.size))
      val parts = pat.split('.')
      val i = rnd.nextInt(parts.length)
      val widened = parts.updated(i, "*").mkString(".")
      for (t <- statics.take(50))
        if (Topic.matches(t, pat))
          assert(Topic.matches(t, widened), s"$t: $pat widened to $widened")
    }
  }

  test("the codegen'd expressions agree with the Scala matcher on random pairs") {
    val topics = (statics.take(100) ++ mixed.take(100)).distinct
    val rows = topics.map { t => val p = Topic.parse(t); (t, p.parts, p.multi) }
    val df = rows.toDF("topic", "parts", "multi").cache()
    for (pat <- mixed.take(30) ++ statics.take(10)) {
      val want = topics.filter(t => Topic.matches(t, pat)).toSet
      val viaString = df.filter(TopicMatches(col("topic"), lit(pat)))
        .select("topic").as[String].collect().toSet
      val viaParts = df.filter(TopicPartsMatches(
          col("parts"), col("multi"), Topic.parse(pat).key))
        .select("topic").as[String].collect().toSet
      assert(viaString == want, s"topic_matches disagrees for $pat")
      assert(viaParts == want, s"topic_parts_matches disagrees for $pat")
    }
    df.unpersist(): Unit
  }
}
