package graft

import java.nio.file.Files

import graft.engine.UnitDb
import graft.model.{Entry, Query, TopicKey}

/** S5 topic security keys: key algebra + secure-mode enforcement on every
  * UnitDb face (reference key.go, hdl_conn.go:489-538, docs/utp.md
  * §Topic-Security). */
class SecuritySpec extends SparkSpec {

  import TopicKey._

  test("key algebra: flags gate independently; wrong topic/flag rejected") {
    val rw = generate("a.b.c", AllowReadWrite)
    assert(validate(rw, "a.b.c", AllowRead))
    assert(validate(rw, "a.b.c", AllowWrite))
    assert(validate(rw, "a.b.c", AllowReadWrite))

    val ro = generate("a.b.c", AllowRead)
    assert(validate(ro, "a.b.c", AllowRead))
    assert(!validate(ro, "a.b.c", AllowWrite), "read key must not write")

    val wo = generate("a.b.c", AllowWrite)
    assert(!validate(wo, "a.b.c", AllowRead), "write key must not read")

    assert(!validate(rw, "a.b.d", AllowRead), "key targets one topic")
    assert(!validate(rw, "a.b", AllowRead))
  }

  test("key algebra: options stripped, master key, wildcard bit, contracts") {
    val k = generate("a.b", AllowReadWrite)
    assert(validate(k, "a.b?last=1h", AllowRead), "?options are not part of the target")
    assert(validate(generate("a.b?ttl=5m", AllowWrite), "a.b", AllowWrite))

    // the `...` master key authorizes every topic (reference key.go:133-136)
    val master = generate("...", AllowReadWrite)
    assert(validate(master, "a.b.c", AllowRead))
    assert(validate(master, "x", AllowWrite))

    assert(isWildcard(generate("a.b...", AllowRead)))
    assert(isWildcard(generate("a.*.c", AllowRead)))
    assert(!isWildcard(generate("a.b.c", AllowRead)))

    // a key minted under one contract is garbage under another
    val kc = generate("a.b", AllowReadWrite, contract = 12345L)
    assert(validate(kc, "a.b", AllowRead, contract = 12345L))
    assert(!validate(kc, "a.b", AllowRead, contract = 99999L))
  }

  test("key algebra: malformed keys never validate") {
    assert(!validate("", "a.b", AllowRead))
    assert(!validate("short", "a.b", AllowRead))
    assert(!validate("!!!!!!!!!!!!!", "a.b", AllowRead)) // 13 chars, bad alphabet
    assert(decode(generate("a.b", AllowRead)).isDefined)
    // tampered key: flip one char
    val k = generate("a.b", AllowReadWrite)
    val flipped = (if (k(0) == 'A') 'B' else 'A') + k.substring(1)
    assert(!validate(flipped, "a.b", AllowRead) || flipped == k)
  }

  test("secure store: keyed put/get roundtrip; every violation throws") {
    val dir = Files.createTempDirectory("graftsec").toString + "/store"
    var now = 1700000000000L
    val db = UnitDb.open(spark, dir, clock = () => now, secureMode = true)
    val wkey = db.keyGen("sec.data", AllowWrite)
    val rkey = db.keyGen("sec.data", AllowRead)

    for (i <- 1 to 5) {
      db.putEntry(Entry(s"$wkey/sec.data", s"m$i".getBytes))
      now += 1000
    }
    db.sync()
    assert(db.get(Query(s"$rkey/sec.data?last=1h")).length == 5)

    // no key at all
    intercept[SecurityException] { db.put("sec.data", "x".getBytes) }
    intercept[SecurityException] { db.get(Query("sec.data")) }
    // read key cannot write, write key cannot read
    intercept[SecurityException] { db.put(s"$rkey/sec.data", "x".getBytes) }
    intercept[SecurityException] { db.get(Query(s"$wkey/sec.data")) }
    // a key for another topic
    val other = db.keyGen("other.topic", AllowReadWrite)
    intercept[SecurityException] { db.put(s"$other/sec.data", "x".getBytes) }
    // scan + tail + delete gates
    intercept[SecurityException] { db.scanFrame(Query("sec.data")) }
    intercept[SecurityException] { db.tail(Query("sec.data")) }
    intercept[SecurityException] { db.delete(1L, "sec.data") }
    // bulk sweep is a write-side op: keyless and read-keyed both rejected
    intercept[SecurityException] { db.deleteMatching(Query("sec.data")) }
    intercept[SecurityException] { db.deleteMatching(Query(s"$rkey/sec.data")) }
    // master key reads everything
    val master = db.keyGen("...", AllowRead)
    assert(db.scanFrame(Query(s"$master/sec...")).count() == 5)
    db.close()
  }

  test("insecure store (default): topics need no keys — S5 is opt-in") {
    val dir = Files.createTempDirectory("graftsec").toString + "/store"
    val db = UnitDb.open(spark, dir)
    db.put("plain.topic", "v".getBytes)
    db.sync()
    assert(db.get(Query("plain.topic")).length == 1)
    db.close()
  }

  test("secure batch: writes authorize per entry/delete through BatchWriter") {
    val dir = Files.createTempDirectory("graftsec").toString + "/store"
    val db = UnitDb.open(spark, dir, secureMode = true)
    val k = db.keyGen("b.t", AllowReadWrite)
    db.batch { b =>
      b.putEntry(Entry(s"$k/b.t", "one".getBytes))
      b.putEntry(Entry(s"$k/b.t", "two".getBytes))
    }
    assert(db.get(Query(s"$k/b.t")).length == 2)
    intercept[SecurityException] {
      db.batch(b => b.putEntry(Entry("b.t", "bad".getBytes)))
    }
    db.close()
  }

  test("secure subscribe: only read-key-bearing subscriptions fan out") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rk = generate("alerts.high", AllowRead)
    val wk = generate("alerts.high", AllowWrite)
    val mc = graft.model.Message.MasterContract
    val subs = Seq(
      (1L, s"$rk/alerts.high", mc, 0),  // authorized
      (2L, s"$wk/alerts.high", mc, 0),  // wrong flag
      (3L, "alerts.high", mc, 0),       // no key
      (4L, s"${generate("...", AllowRead)}/alerts...", mc, 0) // master key, wildcard pattern
    ).toDF("sub_id", "pattern", "contract", "delivery_mode")
    val (kept, rejected) = graft.streaming.Subscribe.validSubs(subs)
    assert(kept.select("sub_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    assert(rejected.count() == 2)
    assert(kept.filter(col("sub_id") === 1).head().getString(1) == "alerts.high",
      "kept patterns are bare — the key never reaches the fan-out join")
    val msgs = Seq(("alerts.high", mc, "m1")).toDF("topic", "contract", "payload")
    val fanned = graft.streaming.Subscribe.fanout(msgs, kept)
    assert(fanned.select("sub_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    // the key check is a codegen expression now — no Scala UDF anywhere
    // in the subscribe resolution plan (r8 VERDICT #3)
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), s"subscribe plan still carries a UDF:\n$plan")
  }

  test("validSubs: a NULL pattern lands in rejected, never vanishes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val mc = graft.model.Message.MasterContract
    val rk = generate("n.t", AllowRead)
    val subs = Seq(
      (1L, Option(s"$rk/n.t"), mc, 0),
      (2L, Option.empty[String], mc, 0) // null pattern
    ).toDF("sub_id", "pattern", "contract", "delivery_mode")
    val (kept, rejected) = graft.streaming.Subscribe.validSubs(subs)
    assert(kept.select("sub_id").as[Long].collect().toSeq == Seq(1L))
    assert(rejected.select("sub_id").as[Long].collect().toSeq == Seq(2L),
      "the null-pattern row must surface in rejected")
    assert(kept.count() + rejected.count() == 2, "no row may vanish")
    val _ = col("sub_id")
  }

  test("TopicKeyValidate expression: codegen and interpreted paths agree") {
    import spark.implicits._
    val rk = generate("a.b", AllowRead)
    val cases = Seq(
      (rk, "a.b", graft.model.Message.MasterContract),
      (rk, "a.c", graft.model.Message.MasterContract), // wrong topic
      ("", "a.b", graft.model.Message.MasterContract), // no key
      ("garbage!", "a.b", graft.model.Message.MasterContract),
      (rk, "a.b", 12345L)) // wrong contract salt
      .toDF("key", "bare", "contract")
    val got = cases.select(graft.functions.TopicKeyValidate(
        org.apache.spark.sql.functions.col("key"),
        org.apache.spark.sql.functions.col("bare"),
        org.apache.spark.sql.functions.col("contract"), AllowRead).as("ok"))
      .as[Boolean].collect().toSeq
    val want = cases.collect().toSeq.map(r =>
      graft.model.TopicKey.validate(r.getString(0), r.getString(1),
        AllowRead, r.getLong(2)))
    assert(got == want && got == Seq(true, false, false, false, false))
  }
}
