package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CharNgramHashesUtil, WinnowFingerprintUtil}

/** Randomized (seeded, deterministic) properties of the rolling-hash
  * kernels against naive reference computations — the unit/edge tests pin
  * fixed vectors; these pin the algebra on generated inputs, including
  * the set-cardinality agreement the near-dup Jaccard relies on. */
class HashKernelPropertySpec extends SparkSpec {

  private val rnd = new Random(4242)
  private val letters = "abcde ∂éü " // small alphabet forces gram repeats

  private def randomText(maxLen: Int): String =
    Iterator.fill(rnd.nextInt(maxLen))(letters(rnd.nextInt(letters.length)))
      .mkString

  private def grams(s: String, n: Int): Set[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < n) Set.empty
    else (0 to cps.length - n)
      .map(i => new String(cps, i, n)).toSet
  }

  test("char_ngram_hashes cardinality equals the distinct gram-set size (no collisions)") {
    for (_ <- 1 to 500) {
      val s = randomText(120)
      val got = CharNgramHashesUtil
        .hashes(UTF8String.fromString(s), 5).toLongArray()
      val ref = grams(s, 5)
      assert(got.length == ref.size, s"cardinality mismatch for '$s'")
      assert(got.toSeq == got.toSeq.distinct.sorted)
    }
  }

  test("char_ngram_hashes: equal gram sets hash to equal sets (set function)") {
    for (_ <- 1 to 300) {
      val s = randomText(60)
      // a string and itself twice share every gram of the halves plus the
      // seam grams — assert the subset relation the construction implies
      val h1 = CharNgramHashesUtil.hashes(UTF8String.fromString(s), 5)
        .toLongArray().toSet
      val h2 = CharNgramHashesUtil.hashes(UTF8String.fromString(s + s), 5)
        .toLongArray().toSet
      assert(h1.subsetOf(h2), s"doubling '$s' must preserve its grams")
    }
  }

  test("winnow_fp selections are minima of the naive k-gram hash windows") {
    def naive(tokens: Array[String]): Seq[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def th(t: String): Long = {
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      }
      val hs = tokens.map(th)
      if (tokens.length < 3) Seq.empty
      else {
        val kg = (0 to tokens.length - 3)
          .map(i => (hs(i) * 4L) ^ (hs(i + 1) * 2L) ^ hs(i + 2))
        kg.indices
          .map(j => kg.slice(j, math.min(j + 4, kg.length)).min)
          .distinct.sorted
      }
    }
    for (_ <- 1 to 300) {
      val toks = Array.fill(rnd.nextInt(20))(randomText(6).trim).filter(_.nonEmpty)
      val got = WinnowFingerprintUtil
        .fp(new GenericArrayData(toks.map(t => UTF8String.fromString(t))
          .asInstanceOf[Array[Any]]))
        .toLongArray().toSeq
      assert(got == naive(toks), s"winnow mismatch for ${toks.toList}")
    }
  }
}
