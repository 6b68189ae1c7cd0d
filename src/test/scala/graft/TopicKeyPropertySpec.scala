package graft

import scala.util.Random

import graft.model.TopicKey
import graft.model.TopicKey._

/** Randomized (seeded, deterministic) property coverage of the key
  * algebra over 1000 generated (topic, permissions, contract) triples —
  * the SecuritySpec vectors pin the reference semantics
  * (key.go:123-203); these pin the algebra. */
class TopicKeyPropertySpec extends SparkSpec {

  private val rnd = new Random(1234)
  private val alphabet = Vector("a", "b", "c", "sensor", "u1", "xy")
  private val flagSets = Vector(AllowRead, AllowWrite, AllowReadWrite,
    AllowRead | AllowAdmin, AllowWrite | AllowOwner)

  private def randomTopic(): String = {
    val depth = 1 + rnd.nextInt(6)
    val parts = Vector.fill(depth)(alphabet(rnd.nextInt(alphabet.size)))
    val withStar =
      if (rnd.nextInt(5) == 0)
        parts.updated(rnd.nextInt(depth), "*")
      else parts
    withStar.mkString(".") + (if (rnd.nextInt(6) == 0) "..." else "")
  }

  test("roundtrip: a minted key always authorizes its own topic and flags") {
    for (_ <- 1 to 1000) {
      val topic = randomTopic()
      val perms = flagSets(rnd.nextInt(flagSets.size))
      val contract = rnd.nextLong()
      val key = generate(topic, perms, contract)
      assert(key.length == EncodedLen)
      assert(validate(key, topic, perms, contract),
        s"own-topic validation failed: $topic perms=$perms")
      // each individual granted flag validates; each missing one does not
      for (f <- Seq(AllowRead, AllowWrite)) {
        val granted = (perms & f) == f
        assert(validate(key, topic, f, contract) == granted,
          s"flag $f on $topic: expected $granted")
      }
    }
  }

  test("separation: a key never authorizes another topic or contract") {
    var crossTopic = 0
    for (_ <- 1 to 1000) {
      val t1 = randomTopic()
      val t2 = randomTopic()
      val contract = rnd.nextLong()
      val key = generate(t1, AllowReadWrite, contract)
      if (t1 != t2 && validate(key, t2, AllowRead, contract)) crossTopic += 1
      // a different contract must never validate (same topic string)
      assert(!validate(key, t1, AllowRead, contract + 1),
        s"contract separation failed for $t1")
    }
    // 32-bit target hash: cross-topic collisions are possible in theory
    // (p ≈ 2^-32 per pair) but must never appear in a 1000-pair sample
    assert(crossTopic == 0, s"$crossTopic cross-topic validations")
  }

  test("split/join: key prefix parsing is total and lossless") {
    for (_ <- 1 to 500) {
      val topic = randomTopic()
      val key = generate(topic, AllowRead)
      assert(split(s"$key/$topic") == ((key, topic)))
      assert(split(topic) == (("", topic)))
      // a topic containing '/' beyond the first separator stays intact
      val nested = s"$key/$topic/extra"
      assert(split(nested) == ((key, s"$topic/extra")))
    }
  }

  test("wire form: decode inverts encode; mutations never crash") {
    for (_ <- 1 to 500) {
      val key = generate(randomTopic(), flagSets(rnd.nextInt(flagSets.size)),
        rnd.nextLong())
      assert(decode(key).isDefined)
      // random mutations: either decode to a different key or fail —
      // never throw, never validate the original topic's write flag by
      // accident more often than the hash bound allows (checked above)
      val i = rnd.nextInt(key.length)
      val mutated = key.updated(i, if (key(i) == 'A') 'B' else 'A')
      decode(mutated) // must not throw
    }
    assert(decode("").isEmpty)
    assert(decode("tooshort").isEmpty)
    assert(decode("~~~~~~~~~~~~~").isEmpty)
    assert(decode(null).isEmpty)
  }
}
