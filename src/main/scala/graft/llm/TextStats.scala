package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-document text analysis for training-data curation: token counts,
  * lexical-diversity and quality signals, a BPE-ish subword-count estimate,
  * and a marker-word language-ID heuristic.
  *
  * Everything is a narrow map over one row — no shuffle at all (the final
  * orderBy exists only for the deterministic oracle compare; a pipeline
  * consumer would drop it). All arithmetic is integer counts plus single
  * IEEE divisions so the DuckDB oracle reproduces results bit-for-bit.
  */
object TextStats {

  /** Quality-filter stopword set (the generated corpus' function words). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and")

  /** Marker vocabularies for the language-ID heuristic, checked in fixed
    * priority order (en, de, fr, es) on ties. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y"))

  private def countIn(w: Column, words: Seq[String]): Column =
    size(filter(w, t => words.map(t === _).reduce(_ || _)))

  /** doc_id, n_tokens, n_unique, ttr, avg_token_len, stop_ratio, bpe_est. */
  def textStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("n_tokens", size(col("w")))
      .withColumn("n_unique", size(array_distinct(col("w"))))
      .withColumn("ttr", col("n_unique") * lit(1.0) / col("n_tokens"))
      .withColumn("avg_token_len",
        (length(col("text")) - (col("n_tokens") - 1)) * lit(1.0) / col("n_tokens"))
      .withColumn("stop_ratio",
        countIn(col("w"), Stopwords) * lit(1.0) / col("n_tokens"))
      // BPE-ish token-count estimate: ceil(len/4) subword units per word
      .withColumn("bpe_est", aggregate(col("w"), lit(0L),
        (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long")))
      .select("doc_id", "n_tokens", "n_unique", "ttr", "avg_token_len",
        "stop_ratio", "bpe_est")
      .orderBy("doc_id")

  /** Marker-word language ID: per-language hit counts + argmax prediction
    * (fixed priority on ties), with the dataset's labeled `lang` retained
    * for comparison. */
  def langId(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val withHits = LangMarkers.foldLeft(docs.withColumn("w", w)) {
      case (df, (lang, markers)) =>
        df.withColumn(s"${lang}_hits", countIn(col("w"), markers))
    }
    val Seq(en, de, fr, es) = LangMarkers.map { case (l, _) => col(s"${l}_hits") }
    withHits
      .withColumn("predicted",
        when(en >= de && en >= fr && en >= es, "en")
          .when(de >= fr && de >= es, "de")
          .when(fr >= es, "fr")
          .otherwise("es"))
      .select("doc_id", "lang", "en_hits", "de_hits", "fr_hits", "es_hits", "predicted")
      .orderBy("doc_id")
  }
}
