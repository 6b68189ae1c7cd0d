package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction — the first step of training the
  * tokenizer every LLM pipeline needs (Sennrich et al., ACL 2016; the
  * architecture HuggingFace `tokenizers` uses for its BPE trainer).
  *
  * The classic formulation looks corpus-sequential (count adjacent symbol
  * pairs, merge the most frequent, repeat), but the standard trick makes
  * it Spark-shaped: pair statistics depend only on the WORD-FREQUENCY
  * table, not the corpus — so the corpus is touched exactly once (one
  * partial-aggregated `groupBy(word)` shuffle, the same linear pass at
  * 100 TB), and every merge round then runs on the vocabulary table,
  * which is bounded by distinct-word count (about 10^7 for web corpora —
  * a comfortable distributed frame). Each round collects exactly ONE row
  * (the argmax pair) to the driver — the same bounded-collect precedent
  * as IVF centroid training.
  *
  * Symbol sequences are represented as marker-delimited strings — word
  * `key` is segmented as `(1)k(2)(1)e(2)(1)y(2)` where (1)/(2) are the
  * control characters U+0001/U+0002 — because applying merge (a,b) is
  * then a plain `replace("(1)a(2)(1)b(2)" -> "(1)ab(2)")`, and both
  * Spark's and DuckDB's `replace` scan left-to-right over
  * non-overlapping occurrences: exactly BPE's greedy merge-application
  * semantics, so the oracle reproduces every round bit-for-bit with no
  * list-fold machinery. The markers make cross-token false matches
  * impossible (a token ending in `a` followed by a token starting with
  * `b` never spells `(1)a(2)(1)b(2)`; words are `[a-z]+`, so token text
  * cannot contain the markers themselves).
  *
  * Tie-break: pair count desc, then (left, right) lexicographic — fully
  * deterministic on both engines.
  */
object Bpe {

  private val M1 = "\u0001" // token-start marker
  private val M2 = "\u0002" // token-end marker

  /** First `k` BPE merges over `[a-z]+` words of `documents.text`.
    * Output: (merge_rank, left_sym, right_sym, merged, pair_count). */
  def bpeMerges(documents: DataFrame, k: Int = 4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._

    // ONE corpus pass: word frequencies. Everything after is vocab-sized.
    val words = documents
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .withColumn("marked", regexp_replace(col("word"), "(.)", s"$M1$$1$M2"))
      .select("marked", "cnt")
      .cache()

    // pairs of adjacent symbols in the current segmentation
    def pairCounts(seg: DataFrame): DataFrame = seg
      .withColumn("toks",
        split(expr("substring(marked, 2, length(marked) - 2)"), s"$M2$M1"))
      // single-token words carry no pairs (and sequence(1, 0) would count
      // DOWN in Spark — [1,0] — not produce an empty list)
      .filter(size(col("toks")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(toks[i-1] AS a, toks[i] AS b))"))
        .as("p"))
      .groupBy($"p.a".as("a"), $"p.b".as("b")).agg(sum("cnt").as("pair_count"))

    var seg: DataFrame = words
    val merges = scala.collection.mutable.ListBuffer[(Int, String, String, String, Long)]()
    var rank = 1
    while (rank <= k && {
      // bounded collect: the single argmax pair of this round (empty when
      // every word is a single token — corpus exhausted before k merges)
      val top = pairCounts(seg)
        .orderBy(col("pair_count").desc, col("a"), col("b"))
        .limit(1).collect()
      top.nonEmpty && {
        val (a, b, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        seg = seg.withColumn("marked",
          replace(col("marked"), lit(s"$M1$a$M2$M1$b$M2"), lit(s"$M1$a$b$M2")))
        merges += ((rank, a, b, a + b, pc))
        true
      }
    }) rank += 1
    words.unpersist()
    merges.toSeq.toDF("merge_rank", "left_sym", "right_sym", "merged", "pair_count")
      .orderBy("merge_rank")
  }

  /** Tokenizer APPLICATION: encode the corpus with the first-`k` learned
    * merges and account the result per document — the pass that turns a
    * trained tokenizer into the pipeline's token counts (budgeting,
    * packing, billing all key off it).
    *
    * Scale shape: training ([[bpeMerges]]) collects k argmax rows; the
    * merge table is then a DRIVER-SIDE literal, so encoding is one
    * zero-shuffle projection over the corpus. The kernel is WHOLE-STRING,
    * not per-word: mark every letter of the space-joined word array in
    * ONE regex pass per document, fold the k merges as literal `replace`s
    * over that single string (a merge pattern contains no space, so it
    * can never span the separator between two words' markers), and read
    * the token count off the result as the number of token-start markers
    * (each merge collapses M2·M1 away, so #tokens ≡ #M1). That keeps the
    * whole projection in codegen'd string builtins — the first cut ran
    * mark+merge+split inside a `transform` lambda, and HOF lambda bodies
    * are interpreted with no subexpression elimination (the l63 lesson;
    * measured 9.2 s → see bench_full.json after this rewrite). No
    * explode, no groupBy: the corpus is touched once and never shuffled
    * (the oracle, which must re-derive the merges in SQL, uses an
    * explode+regroup instead — same rows, different plan).
    * Output: (doc_id, n_words, n_bpe_tokens). */
  def bpeEncode(documents: DataFrame, k: Int = 4): DataFrame = {
    val merges = bpeMerges(documents, k)
      .select("left_sym", "right_sym").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def applyMerges(m: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      merges.foldLeft(m) { case (c, (a, b)) =>
        replace(c, lit(s"$M1$a$M2$M1$b$M2"), lit(s"$M1$a$b$M2"))
      }
    documents
      .select(col("doc_id"),
        expr("regexp_extract_all(lower(text), '[a-z]+', 0)").as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
        regexp_replace(array_join(col("ws"), " "), "([a-z])", s"$M1$$1$M2")
          .as("m"))
      .select(col("doc_id"), col("n_words"),
        (length(applyMerges(col("m"))) -
          length(replace(applyMerges(col("m")), lit(M1), lit(""))))
          .cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** DuckDB oracle for [[bpeEncode]]: re-derives the k merges with the
    * [[bpeMergesSql]] CTE chain, then applies them word-by-word
    * (explode words → chained `replace` against the CROSS JOINed top-i
    * rows → regroup per doc). Wordless documents come back via the
    * left join with zero counts. */
  def bpeEncodeSql(k: Int = 4): String = {
    val m1 = "chr(1)"
    val m2 = "chr(2)"
    val applied = (1 to k).foldLeft("mw.m") { (acc, i) =>
      s"replace($acc, $m1 || t$i.a || $m2 || $m1 || t$i.b || $m2, $m1 || t$i.a || t$i.b || $m2)"
    }
    val crosses = (1 to k).map(i => s"CROSS JOIN top$i t$i").mkString(" ")
    s"""WITH ${trainingCtes(k)},
       |docs AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
       |         FROM documents),
       |uw AS (SELECT doc_id, unnest(ws) AS w FROM docs),
       |mw AS (SELECT doc_id,
       |         regexp_replace(w, '(.)', $m1 || '\\1' || $m2, 'g') AS m
       |       FROM uw),
       |ew AS (SELECT mw.doc_id, $applied AS e FROM mw $crosses),
       |cnt AS (SELECT doc_id, COUNT(*)::BIGINT AS n_words,
       |          SUM(len(string_split(substr(e, 2, length(e) - 2),
       |                               $m2 || $m1)))::BIGINT AS n_bpe_tokens
       |        FROM ew GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(cnt.n_words, 0) AS n_words,
       |  COALESCE(cnt.n_bpe_tokens, 0) AS n_bpe_tokens
       |FROM docs d LEFT JOIN cnt USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** The training CTE chain shared by both oracles: seg0 → top1 → seg1
    * → … → top`k` (each top$i = that round's argmax pair). */
  private def trainingCtes(k: Int): String = {
    val m1 = "chr(1)"
    val m2 = "chr(2)"
    def segCte(i: Int): String =
      if (i == 0)
        s"""seg0 AS (
           |  SELECT regexp_replace(word, '(.)', $m1 || '\\1' || $m2, 'g') AS marked, cnt
           |  FROM (SELECT w AS word, count(*)::BIGINT AS cnt
           |        FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
           |              FROM documents) u
           |        GROUP BY 1) w0)""".stripMargin
      else
        s"""seg$i AS (
           |  SELECT replace(s.marked,
           |                 $m1 || m.a || $m2 || $m1 || m.b || $m2,
           |                 $m1 || m.a || m.b || $m2) AS marked, s.cnt
           |  FROM seg${i - 1} s CROSS JOIN top$i m)""".stripMargin
    def topCte(i: Int): String =
      s"""toks$i AS (
         |  SELECT cnt,
         |         string_split(substr(marked, 2, length(marked) - 2), $m2 || $m1) AS toks
         |  FROM seg${i - 1}),
         |pairs$i AS (
         |  SELECT toks[i] AS a, toks[i + 1] AS b, sum(cnt)::BIGINT AS pair_count
         |  FROM (SELECT cnt, toks, unnest(range(1, len(toks))) AS i FROM toks$i) t
         |  GROUP BY 1, 2),
         |top$i AS (SELECT a, b, pair_count FROM pairs$i
         |          ORDER BY pair_count DESC, a, b LIMIT 1)""".stripMargin
    (segCte(0) +: (1 to k).flatMap(i =>
      Seq(topCte(i)) ++ (if (i < k) Seq(segCte(i)) else Nil))).mkString(",\n")
  }

  /** DuckDB oracle: the same k rounds as a CTE chain. `replace` has the
    * same greedy non-overlapping left-to-right semantics there, and the
    * marker encoding makes each round one `replace` + one pair-explode. */
  def bpeMergesSql(k: Int = 4): String = {
    val out = (1 to k)
      .map(i => s"SELECT $i AS merge_rank, a AS left_sym, b AS right_sym, a || b AS merged, pair_count FROM top$i")
      .mkString("\nUNION ALL\n")
    s"WITH ${trainingCtes(k)}\n$out\nORDER BY merge_rank"
  }
}
