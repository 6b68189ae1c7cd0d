package graft.model

import scala.util.hashing.MurmurHash3

/** S5 topic security keys — per-topic access keys carried as a `key/topic`
  * prefix, with a keygen API (reference server/internal/message/security/
  * key.go:28-237, server/internal/hdl_conn.go:489-538, docs/utp.md
  * §Topic-Security).
  *
  * Semantics preserved from the reference:
  *  - a key is 8 bytes: permission flags, a 24-bit part path (strict flag
  *    + one literal-mark bit per topic level), and a 32-bit contract-salted
  *    hash of the key's target topic (key.go:124-186);
  *  - permissions are a flag set — owner / admin / read (subscribe) /
  *    write (publish) (key.go:29-35);
  *  - the key must be prefixed to the topic with `/` (docs/utp.md:175);
  *  - validation = permission-flag check + target-hash equality against
  *    the requested topic (options stripped), with the `...` master key
  *    authorizing every topic (key.go:123-140, hdl_conn.go:489-507);
  *  - insecure mode skips all of it (docs/utp.md:229) — [[graft.engine.
  *    UnitDb]] opens insecure by default.
  *
  * Mechanics are NOT copied: the hash is Scala's MurmurHash3 seeded by the
  * contract (the reference uses its own FNV-variant `hash.WithSalt`), the
  * wire form is unpadded RFC-4648 base32 of the masked bytes (the
  * reference base8-encodes), and the mask keys off both header bytes. Keys
  * are deterministic given (contract, topic, permissions) — no stored key
  * registry, which is what makes validation a pure driver-side check: auth
  * decisions happen once at plan time (or per-row inside the ingest
  * dead-letter seam), never as a distributed join.
  */
object TopicKey {

  // Access flags (reference key.go:29-35).
  val AllowNone = 0
  val AllowOwner = 1 << 1
  val AllowAdmin = 1 << 2
  val AllowRead = 1 << 3
  val AllowWrite = 1 << 4
  val AllowReadWrite: Int = AllowRead | AllowWrite

  /** Key/topic separator in a keyed topic string (docs/utp.md:175). */
  val Separator = '/'

  private val RawLen = 8
  /** 8 bytes → 13 unpadded base32 chars (matches the reference's 13-char
    * wire length, different alphabet/derivation). */
  val EncodedLen = 13

  private val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val AlphabetIdx: Map[Char, Int] = Alphabet.zipWithIndex.toMap

  /** Contract-salted 32-bit topic hash (reference Target(), key.go:94-97). */
  private def topicHash(topic: String, contract: Long): Int =
    MurmurHash3.bytesHash(
      topic.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      (contract ^ (contract >>> 32)).toInt)

  /** Strip a `?k=v` options suffix — keys target the topic pattern only
    * (reference Topic.Size excludes options, key.go:108-119). */
  private def stripOptions(topic: String): String = {
    val i = topic.indexOf('?')
    if (i < 0) topic else topic.substring(0, i)
  }

  /** 24-bit part path: bit 23 set = strict (no wildcard); bits 22.. mark
    * literal parts (reference SetTarget, key.go:143-186). */
  private def bitPath(topic: String): Int = {
    val parts = topic.split('.').filter(_.nonEmpty)
    require(parts.length <= 23, s"topic can not have more than 23 parts: $topic")
    var bits =
      if (topic.endsWith(Topic.Multi) || parts.exists(_.endsWith("*"))) 0
      else 1 << 23
    parts.iterator.zipWithIndex.foreach { case (p, idx) =>
      if (!p.endsWith("*") && !p.endsWith(Topic.Multi))
        bits |= 1 << (22 - idx)
    }
    bits
  }

  /** Mint the key string for a topic pattern (reference GenerateKey,
    * key.go:194-203; served by the server's keygen special request,
    * hdl_conn.go:558-594). */
  def generate(topic: String, permissions: Int,
      contract: Long = Message.MasterContract): String = {
    val t = stripOptions(topic)
    val raw = new Array[Byte](RawLen)
    raw(0) = permissions.toByte
    val bp = bitPath(t)
    raw(1) = (bp >> 16).toByte
    raw(2) = (bp >> 8).toByte
    raw(3) = bp.toByte
    val h = topicHash(t, contract)
    raw(4) = (h >> 24).toByte
    raw(5) = (h >> 16).toByte
    raw(6) = (h >> 8).toByte
    raw(7) = h.toByte
    encode(mask(raw))
  }

  /** XOR bytes 2..7 with the two header bytes — the reference's masking
    * idea (key.go:205-221), keyed off both header bytes here. */
  private def mask(raw: Array[Byte]): Array[Byte] = {
    val out = raw.clone()
    var i = 2
    while (i < RawLen) {
      out(i) = (out(i) ^ out(0)).toByte
      out(i + 1) = (out(i + 1) ^ out(1)).toByte
      i += 2
    }
    out
  }

  private def encode(buf: Array[Byte]): String = {
    var acc = 0L
    var i = 0
    while (i < RawLen) { acc = (acc << 8) | (buf(i) & 0xffL); i += 1 }
    // 64 bits → 13 × 5-bit groups, most significant first (one leading
    // zero bit of padding)
    val sb = new StringBuilder(EncodedLen)
    var shift = 60
    while (shift >= 0) {
      sb.append(Alphabet(((acc >>> shift) & 0x1f).toInt))
      shift -= 5
    }
    sb.toString
  }

  /** Decode a wire key back to its 8 raw bytes; None if malformed
    * (reference DecodeKey, key.go:223-237). */
  def decode(key: String): Option[Array[Byte]] = {
    if (key == null || key.length != EncodedLen) return None
    var acc = 0L
    var i = 0
    while (i < EncodedLen) {
      AlphabetIdx.get(key.charAt(i)) match {
        case Some(v) => acc = (acc << 5) | v.toLong
        case None => return None
      }
      i += 1
    }
    val buf = new Array[Byte](RawLen)
    var shift = 56
    i = 0
    while (i < RawLen) { buf(i) = ((acc >>> shift) & 0xff).toByte; shift -= 8; i += 1 }
    Some(mask(buf)) // mask is its own inverse
  }

  /** Permission + target check (reference HasPermission + ValidateTopic,
    * key.go:123-140,188-192): the key must carry `flag` and its target
    * hash must equal the requested topic's (options stripped), unless it
    * is the `...` master key, which authorizes every topic. */
  def validate(key: String, topic: String, flag: Int,
      contract: Long = Message.MasterContract): Boolean =
    decode(key).exists { raw =>
      val perms = raw(0) & 0xff
      if ((perms & flag) != flag) false
      else {
        val target = ((raw(4) & 0xff) << 24) | ((raw(5) & 0xff) << 16) |
          ((raw(6) & 0xff) << 8) | (raw(7) & 0xff)
        target == topicHash(Topic.Multi, contract) ||
          target == topicHash(stripOptions(topic), contract)
      }
    }

  /** Split `key/topic` → (key, topic); no separator → ("", whole string)
    * (reference ParseKey, key.go:99-121). */
  def split(keyedTopic: String): (String, String) = {
    val i = if (keyedTopic == null) -1 else keyedTopic.indexOf(Separator)
    if (i < 0) ("", if (keyedTopic == null) "" else keyedTopic)
    else (keyedTopic.substring(0, i), keyedTopic.substring(i + 1))
  }

  /** True if the decoded key was minted for a wildcard pattern (strict
    * bit clear — reference ValidateTopic's `wildcard` return). */
  def isWildcard(key: String): Boolean =
    decode(key).exists(raw => ((raw(1) & 0xff) >> 7) == 0)
}
