package graft.model

/** Hierarchical topic model with bidirectional wildcard semantics.
  *
  * Semantics derived from the reference (unit-io/unitdb):
  *  - topics are `.`-separated part lists (reference: message/topic.go:204-296)
  *  - `*` matches exactly one level (reference: message/topic.go:257-285)
  *  - a trailing `...` matches any number of remaining levels
  *    (reference: message/topic.go:246-252, trie.go:184-185)
  *  - wildcards may appear on EITHER side — a stored wildcard topic matches a
  *    static query and vice versa (reference: trie.go:156-188,
  *    db_test.go:288-318)
  *  - depths must be equal unless either side is multi-level (trie.go:165)
  *  - options are parsed from a `?k=v&k=v` suffix; only `ttl` and `last`
  *    exist (reference: message/topic.go:108-133, 179-201)
  *
  * The representation here is deliberately Spark-friendly: a topic is its
  * `parts: Seq[String]` plus a `multi: Boolean` flag (trailing `...`), so the
  * matcher is a plain two-pointer walk over string arrays — no hashes, no
  * trie. On a cluster the parts live in an `ARRAY<STRING>` column and the
  * match runs inside whole-stage codegen via [[graft.functions.TopicMatches]].
  */
final case class Topic(
    parts: IndexedSeq[String],
    multi: Boolean,
    options: Map[String, String]) {

  def depth: Int = parts.length

  /** True if this topic contains any wildcard (single- or multi-level). */
  def isWildcard: Boolean = multi || parts.contains(Topic.Single)

  /** Canonical string form without options. */
  def key: String = parts.mkString(".") + (if (multi) {
    if (parts.isEmpty) Topic.Multi else "." + Topic.Multi
  } else "")

  /** `?ttl=` duration in milliseconds, if present and valid. */
  def ttlMillis: Option[Long] =
    options.get("ttl").flatMap(Topic.parseDurationMillis)

  /** `?last=` — Right(duration ms) for `last=1h` forms, Left(count) for
    * `last=10` integer forms (reference: message/topic.go:119-133). */
  def last: Option[Either[Int, Long]] =
    options.get("last").flatMap { v =>
      Topic.parseDurationMillis(v) match {
        case Some(ms) => Some(Right(ms))
        case None     => v.toIntOption.map(Left(_))
      }
    }
}

object Topic {
  val Single = "*"
  val Multi = "..."
  /** Reference caps depth at 100 (message/topic.go:36-39). */
  val MaxDepth = 100
  /** Reference caps topic byte length at 64 KiB (db_internal.go:56-60). */
  val MaxKeyLength = 65535

  /** Parse `a.b.*?ttl=1h&last=10` into parts + multi flag + options. */
  def parse(raw: String): Topic = {
    require(raw != null && raw.nonEmpty, "empty topic")
    require(raw.length <= MaxKeyLength, s"topic longer than $MaxKeyLength")
    val qIdx = raw.indexOf('?')
    val (keyPart, optPart) =
      if (qIdx >= 0) (raw.substring(0, qIdx), raw.substring(qIdx + 1))
      else (raw, "")
    val options: Map[String, String] =
      if (optPart.isEmpty) Map.empty
      else optPart.split('&').iterator.filter(_.nonEmpty).map { kv =>
        val eq = kv.indexOf('=')
        if (eq >= 0) kv.substring(0, eq) -> kv.substring(eq + 1)
        else kv -> ""
      }.toMap

    val (body, multi) =
      if (keyPart == Multi) ("", true)
      else if (keyPart.endsWith("." + Multi))
        (keyPart.substring(0, keyPart.length - 4), true)
      else if (keyPart.endsWith(Multi)) // e.g. "unit.b..." == "unit.b" + "..."
        (keyPart.substring(0, keyPart.length - 3).stripSuffix("."), true)
      else (keyPart, false)

    val parts: IndexedSeq[String] =
      if (body.isEmpty) Vector.empty
      else body.split('.').toVector
    require(parts.forall(_.nonEmpty), s"empty topic level in '$raw'")
    require(parts.length <= MaxDepth, s"topic deeper than $MaxDepth")
    Topic(parts, multi, options)
  }

  /** Go-style duration: `1h30m`, `10s`, `250ms`, `1us`, `1ns`. Returns
    * milliseconds (sub-millisecond components truncate). */
  def parseDurationMillis(s: String): Option[Long] = {
    if (s == null || s.isEmpty) return None
    var i = 0
    var totalNanos = 0L
    var sawUnit = false
    while (i < s.length) {
      var j = i
      while (j < s.length && (s.charAt(j).isDigit || s.charAt(j) == '.')) j += 1
      if (j == i) return None // unit with no number
      val num = s.substring(i, j)
      var k = j
      while (k < s.length && !s.charAt(k).isDigit) k += 1
      val unit = s.substring(j, k)
      val mult: Long = unit match {
        case "h"  => 3600L * 1000 * 1000 * 1000
        case "m"  => 60L * 1000 * 1000 * 1000
        case "s"  => 1000L * 1000 * 1000
        case "ms" => 1000L * 1000
        case "us" | "µs" => 1000L
        case "ns" => 1L
        case _    => return None
      }
      val value = num.toDoubleOption.getOrElse(return None)
      totalNanos += (value * mult).toLong
      sawUnit = true
      i = k
    }
    if (sawUnit) Some(totalNanos / 1000000L) else None
  }

  /** Bidirectional wildcard match over parsed parts (SURVEY §2.3).
    *
    * Both sides may contain `*` parts and/or be multi-level. A pair of
    * levels matches when equal or either is `*`; lengths must be equal
    * unless the shorter side is multi-level (its `...` absorbs the rest).
    * Mirrors reference trie.lookup (trie.go:156-188) without the trie.
    */
  def matchParts(
      a: IndexedSeq[String], aMulti: Boolean,
      b: IndexedSeq[String], bMulti: Boolean): Boolean = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      if (x != y && x != Single && y != Single) return false
      i += 1
    }
    if (a.length == b.length) true
    else if (a.length < b.length) aMulti
    else bMulti
  }

  /** String-level match: parses both sides (options ignored) and matches. */
  def matches(topic: String, pattern: String): Boolean = {
    val t = parse(topic)
    val p = parse(pattern)
    matchParts(t.parts, t.multi, p.parts, p.multi)
  }
}
