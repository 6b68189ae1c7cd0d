package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Topic

class TopicSpec extends AnyFunSuite {

  // Golden vectors from the reference test suite (db_test.go:296-308):
  // (stored topic, query topic) — must match in BOTH directions.
  val goldenPairs: Seq[(String, String)] = Seq(
    "..." -> "unit.b.b1",
    "unit.b..." -> "unit.b.b1.b11.b111.b1111.b11111.b111111",
    "unit.*.b1.b11.*.*.b11111.*" -> "unit.b.b1.b11.b111.b1111.b11111.b111111",
    "unit.*.b1.*.*.*.b11111.*" -> "unit.b.b1.b11.b111.b1111.b11111.b111111",
    "unit.b.b1" -> "unit.b.b1",
    "unit.b.b1.b11" -> "unit.b.b1.b11",
    "unit.b" -> "unit.b"
  )

  test("golden wildcard vectors match bidirectionally") {
    for ((stored, query) <- goldenPairs) {
      assert(Topic.matches(stored, query), s"$stored should match $query")
      assert(Topic.matches(query, stored), s"$query should match $stored")
    }
  }

  test("non-matches") {
    assert(!Topic.matches("unit.b.b1", "unit.b"))      // depth mismatch
    assert(!Topic.matches("unit.b", "unit.c"))         // literal mismatch
    assert(!Topic.matches("unit.*.b1", "unit.b.b2"))   // star + literal miss
    assert(!Topic.matches("a.b...", "a.c.d"))          // prefix miss w/ multi
    assert(!Topic.matches("unit.b.b1.b11", "unit.b.b1"))
  }

  test("multi-level matches shorter and equal depths") {
    assert(Topic.matches("a.b...", "a.b"))
    assert(Topic.matches("a.b...", "a.b.c"))
    assert(Topic.matches("...", "x"))
  }

  test("option parsing: ttl and last") {
    val t = Topic.parse("teams.alpha.ch1.u1?ttl=1h")
    assert(t.parts == Vector("teams", "alpha", "ch1", "u1"))
    assert(!t.isWildcard)
    assert(t.ttlMillis.contains(3600L * 1000))

    val l = Topic.parse("teams.alpha.ch1?last=30m")
    assert(l.last.contains(Right(30L * 60 * 1000)))
    val c = Topic.parse("teams.alpha.ch1?last=10")
    assert(c.last.contains(Left(10)))
    val both = Topic.parse("a.b?ttl=1h30m&last=100")
    assert(both.ttlMillis.contains(5400L * 1000))
    assert(both.last.contains(Left(100)))
  }

  test("wildcard parse shapes") {
    val w = Topic.parse("unit.*.b1...")
    assert(w.parts == Vector("unit", "*", "b1") && w.multi && w.isWildcard)
    val m = Topic.parse("...")
    assert(m.parts.isEmpty && m.multi)
    val s = Topic.parse("unit.b...")
    assert(s.parts == Vector("unit", "b") && s.multi)
  }

  test("duration parser") {
    assert(Topic.parseDurationMillis("1h").contains(3600000L))
    assert(Topic.parseDurationMillis("1h30m").contains(5400000L))
    assert(Topic.parseDurationMillis("250ms").contains(250L))
    assert(Topic.parseDurationMillis("10").isEmpty)   // bare int is not a duration
    assert(Topic.parseDurationMillis("1x").isEmpty)
  }

  private val alphabet = Vector("a", "b", "c", "d", "unit", "b1")

  test("property: pattern derived from a topic always matches it") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val parts = Vector.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size)))
      // replace random levels with '*' and optionally truncate with '...'
      val starred = parts.map(p => if (rnd.nextBoolean()) "*" else p)
      val cut = 1 + rnd.nextInt(starred.length)
      val (pat, multi) =
        if (cut < starred.length) (starred.take(cut), true)
        else (starred, rnd.nextBoolean())
      val patStr = pat.mkString(".") + (if (multi) "..." else "")
      val topicStr = parts.mkString(".")
      assert(Topic.matches(topicStr, patStr), s"$patStr vs $topicStr")
      assert(Topic.matches(patStr, topicStr), s"$topicStr vs $patStr")
    }
  }

  test("property: depth mismatch without multi never matches") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val parts = Vector.fill(1 + rnd.nextInt(8))(alphabet(rnd.nextInt(alphabet.size)))
      val longer = parts ++ Vector.fill(1 + rnd.nextInt(3))("z")
      assert(!Topic.matches(parts.mkString("."), longer.mkString(".")))
    }
  }
}
