package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** Session-extension installer — the deployment-grade integration point:
  * `spark.sql.extensions=graft.GraftExtensions` makes every graft SQL
  * function available in all sessions of a cluster without touching user
  * code (the same functions can be added to one live session with
  * [[GraftFunctions.registerAll]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        builder))
    }
}

/** SQL-facing registry of graft's custom expressions. */
object GraftFunctions {

  /** Extract a foldable string argument (e.g. a pattern literal). */
  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other if other.foldable => String.valueOf(other.eval())
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case other if other.foldable => other.eval().toString.toInt
    case _ => throw new IllegalArgumentException(s"$what must be a literal")
  }

  /** (name, usage, builder) for every SQL-expressible graft function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("topic_matches",
      "topic_matches(topic, pattern) - bidirectional wildcard topic match",
      (exprs: Seq[Expression]) => TopicMatches(exprs(0), exprs(1))),
    ("topic_parts_matches",
      "topic_parts_matches(topic_parts, is_multi, 'pattern') - pre-parsed store-side match",
      (exprs: Seq[Expression]) => TopicPartsMatches(
        exprs(0), exprs(1), litString(exprs(2), "pattern"))),
    ("dot_product",
      "dot_product(a, b) - sequential-fold dot product of two double arrays",
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    ("minhash_sig",
      "minhash_sig(hashes, k) - k-slot MinHash signature of an element-hash set",
      (exprs: Seq[Expression]) => MinHashSig(exprs(0), litInt(exprs(1), "k"))),
    ("simhash_fp",
      "simhash_fp(tokens) - 32-bit SimHash fingerprint of a token array",
      (exprs: Seq[Expression]) => SimHashFp(exprs(0))),
    ("trigram_hashes",
      "trigram_hashes(tokens) - distinct word-trigram hash set of a token array",
      (exprs: Seq[Expression]) => TrigramHashes(exprs(0))),
    ("ngram_hashes",
      "ngram_hashes(tokens, n) - distinct word-n-gram hash set of a token array",
      (exprs: Seq[Expression]) => NGramHashes(exprs(0), litInt(exprs(1), "n"))),
    ("ngram_hashes_all",
      "ngram_hashes_all(tokens, n) - sorted word-n-gram hashes with multiplicity",
      (exprs: Seq[Expression]) => NGramHashesAll(exprs(0), litInt(exprs(1), "n"))),
    ("char_ngram_hashes",
      "char_ngram_hashes(text, n) - distinct character-n-gram hash set of a string",
      (exprs: Seq[Expression]) => CharNgramHashes(exprs(0), litInt(exprs(1), "n"))),
    ("winnow_fp",
      "winnow_fp(tokens) - winnowing (rolling-hash) document fingerprint of a token array",
      (exprs: Seq[Expression]) => WinnowFingerprint(exprs(0))),
    ("nfc_normalize",
      "nfc_normalize(text) - Unicode canonical composition (NFC) of a string",
      (exprs: Seq[Expression]) => NfcNormalize(exprs(0))))

  /** Register every graft function in one live session — the scalar
    * expressions above plus the aggregate surface (UDAFs register
    * through the udf registry, not the expression builder path). */
  def registerAll(spark: SparkSession): Unit = {
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    spark.udf.register("kmv_minima",
      org.apache.spark.sql.functions.udaf(
        new KmvMinima(KmvMinima.DefaultK),
        org.apache.spark.sql.Encoders.STRING))
    ()
  }
}
