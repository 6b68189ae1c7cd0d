package graft

import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Resample.gridLocf / Resample.rate semantics, plus the round-5 scoring
  * operators (scalar quantization, BM25) on synthetic frames. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  // series "a": points at buckets 0 and 20; series "b": single point at 10
  private def pts = Seq(
    ("a", 0L, 1.0), ("a", 20L, 3.0),
    ("b", 10L, 7.0)
  ).toDF("k", "t", "v")

  test("gridLocf: dense global grid per series, LOCF carry, filled flag") {
    val out = Resample.gridLocf(pts, Seq("k"), "t", Seq("v"), 10L)
      .orderBy("k", "t")
      .select("k", "t", "v", "filled")
      .as[(String, Long, Option[Double], Boolean)].collect().toSeq
    assert(out === Seq(
      ("a", 0L, Some(1.0), false),
      ("a", 10L, Some(1.0), true),  // gap: carries 1.0
      ("a", 20L, Some(3.0), false),
      ("b", 0L, None, true),        // leading gap stays null
      ("b", 10L, Some(7.0), false),
      ("b", 20L, Some(7.0), true)))
  }

  test("gridLocf: zeroCols zero-fill instead of carrying") {
    val withN = pts.withColumn("n", lit(5L))
    val out = Resample.gridLocf(withN, Seq("k"), "t", Seq("v"), 10L,
        zeroCols = Seq("n"))
      .filter(col("k") === "a").orderBy("t")
      .select("t", "n").as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 5L), (10L, 0L), (20L, 5L)))
  }

  test("gridLocf: empty input yields empty output") {
    assert(Resample.gridLocf(pts.filter(lit(false)), Seq("k"), "t",
      Seq("v"), 10L).count() === 0L)
  }

  test("rate: per-series deltas, null first point, zero-dt guard") {
    val obs = Seq(
      ("a", 100L, 10.0, 1L), ("a", 300L, 11.0, 2L),
      ("a", 300L, 20.0, 3L), // same timestamp: dt=0 => null rate
      ("b", 50L, 5.0, 4L)
    ).toDF("k", "t", "v", "id")
    val out = Resample.rate(obs, Seq("k"), "t", "v", tiebreak = "id",
        perSecond = 1e6)
      .orderBy("k", "t", "id")
      .select("k", "id", "dv", "dt", "rate")
      .as[(String, Long, Option[Double], Option[Long], Option[Double])]
      .collect().toSeq
    assert(out(0) === (("a", 1L, None, None, None)))
    assert(out(1) === (("a", 2L, Some(1.0), Some(200L), Some(1.0 * 1e6 / 200))))
    assert(out(2) === (("a", 3L, Some(9.0), Some(0L), None)))
    assert(out(3) === (("b", 4L, None, None, None)))
  }

  test("scalarQuantize: reconstruction error bounded by half a grid step") {
    val emb = Tables.embeddings(spark, sf("sf0.001"))
    val audited = graft.llm.Similarity.scalarQuantize(emb)
      .join(emb.select(col("vec_id"),
        (array_max(transform(col("embedding"), x => x.cast("double"))) -
         array_min(transform(col("embedding"), x => x.cast("double"))))
          .as("range")), "vec_id")
      // max_err <= scale/2 (+ double-rounding slack)
      .filter(col("max_err") > col("range") / 255.0 / 2.0 * 1.000001 + 1e-12)
    assert(audited.count() === 0L)
  }

  test("bm25: ranks by tf saturation and length norm; rank contiguous") {
    val docs = Seq(
      (1L, "x x x x y"),       // tf(x)=4, short doc
      (2L, "x y y y y y y y"), // tf(x)=1, longer doc
      (3L, "z z z z z z")      // no x at all
    ).toDF("doc_id", "text")
    val out = graft.llm.TextStats.bm25(docs, Seq("x"), k = 5)
      .select("rank", "doc_id").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 2L))) // doc 1 outranks doc 2; doc 3 absent
  }

  test("sourceMixWeights: sqrt temperature upsamples the tail") {
    val docs = Seq(
      (1L, "a b c d", "big"), (2L, "a b c d", "big"),
      (3L, "a b c d", "big"), (4L, "a b c d", "big"),
      (5L, "a b c d", "small")
    ).toDF("doc_id", "text", "source")
    val out = graft.llm.TextStats.sourceMixWeights(docs)
      .select("source", "n_tokens", "rel_weight", "boost")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("big") === ((16L, 1.0, 1.0)))
    // small = 1/4 the tokens: weight sqrt(1/4) = 1/2, boost = 2
    assert(out("small") === ((4L, 0.5, 2.0)))
  }

  test("bigramNovelty: shared bigrams raise mean_cf, unique ones uniq_frac") {
    val docs = Seq(
      (1L, "x y z"),      // bigrams: "x y", "y z"
      (2L, "x y q"),      // bigrams: "x y", "y q"
      (3L, "w")           // no bigrams: no output row
    ).toDF("doc_id", "text")
    val out = graft.llm.TextStats.bigramNovelty(docs)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((2L, 1.5, 0.5))) // "x y" cf=2, "y z" cf=1
    assert(out(2L) === ((2L, 1.5, 0.5)))
  }

  test("semanticDecontam: planted near-duplicate of a bench vector flags; orthogonal does not") {
    import spark.implicits._
    // bench = vec_id % 50 == 0 → {0}; corpus: 1 = scaled copy of bench 0
    // (cosine 1), 2 = orthogonal (cosine 0), 3 = zero vector (excluded
    // from geometry, still reported uncontaminated with NULL max_cos)
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0),
      (1L, Array(3f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f), 0),
      (3L, Array(0f, 0f, 0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = graft.llm.Similarity.semanticDecontam(emb)
      .select("vec_id", "contaminated")
      .as[(Long, Boolean)].collect().toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("semanticDecontam: the eval slice is FIXED — a bench-shaped id at or " +
      "past EvalIdBound is corpus, not benchmark") {
    import spark.implicits._
    val bound = graft.llm.Similarity.EvalIdBound
    // id 0 is the one real eval vector; `bound` (also % 50 == 0) is a
    // ScaleData-replica id and must be SCORED like any corpus row — it
    // duplicates eval 0, so it flags; `bound + 2` is orthogonal to the
    // eval set and must NOT flag even though it duplicates corpus id 2
    // (corpus-corpus similarity is l21's job, not decontam's)
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)),
      (bound, Array(1f, 0f, 0f)),
      (bound + 2L, Array(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val out = graft.llm.Similarity.semanticDecontam(emb)
      .select("vec_id", "contaminated")
      .as[(Long, Boolean)].collect().toMap
    assert(out === Map(2L -> false, bound -> true, (bound + 2L) -> false),
      s"got $out")
  }

  test("semanticDecontam: eval-table seam — eval arrives as its own DataFrame, " +
      "no id arithmetic in the operator") {
    import spark.implicits._
    // eval ids are an arbitrary namespace (5 is NOT % 50 == 0 — nothing
    // slice-shaped survives in the primary seam); corpus 13 ties at
    // cos 1/sqrt(2) to both eval vectors → smallest bench_id (0) wins
    val corpus = Seq(
      (10L, Array(2f, 0f, 0f)),
      (11L, Array(0f, 1f, 0f)),
      (12L, Array(0f, 0f, 3f)),
      (13L, Array(1f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val eval = Seq(
      (0L, Array(1f, 0f, 0f)),
      (5L, Array(0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = graft.llm.Similarity.semanticDecontam(corpus, eval, tau = 0.9)
      .select("vec_id", "contaminated", "bench_id")
      .as[(Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      10L -> ((true, Some(0L))), 11L -> ((false, Some(0L))),
      12L -> ((true, Some(5L))), 13L -> ((false, Some(0L)))))
  }

  test("dynamic session gap: a purchase holds the session open where a click would not") {
    import spark.implicits._
    // purchase at t=0 (gap 3600) + click at t=2400 → ONE session ending
    // max(0+3600, 2400+1800) = 4200; the same pair click-first splits
    // (click's 1800 gap closes at 1800 < 2400)
    def run(firstType: String) = {
      val ev = Seq(
        (1L, new java.sql.Timestamp(0L), 7L, firstType, 1.0, "{}"),
        (2L, new java.sql.Timestamp(2400L * 1000), 7L, "click", 2.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val gap = when(col("event_type") === "purchase", "60 minutes")
        .otherwise("30 minutes")
      ev.groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("w.start")).as("s"),
          unix_timestamp(col("w.end")).as("e"), col("n"))
        .orderBy("s")
        .as[(Long, Long, Long)].collect().toSeq
    }
    assert(run("purchase") === Seq((0L, 4200L, 2L)))
    assert(run("click") === Seq((0L, 1800L, 1L), (2400L, 4200L, 1L)))
  }

  test("lmPerplexity: hand-computed add-one bigram LM on a 3-doc corpus") {
    val docs = Seq(
      (1L, "a b a b"), // bigrams: a b, b a, a b
      (2L, "a b c"),   // bigrams: a b, b c
      (3L, "z")        // < 2 tokens: no bigrams, no output row
    ).toDF("doc_id", "text")
    val out = graft.llm.TextStats.lmPerplexity(docs)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out.keySet === Set(1L, 2L))
    // c1: a=3 b=3 c=1; V=3 (z's doc is dropped before counting);
    // c2: "a b"=3, "b a"=1, "b c"=1; P(b|a)=(3+1)/(3+3), P(a|b)=(1+1)/(3+3)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val avg1 = r6((2 * math.log(4.0 / 6) + math.log(2.0 / 6)) / 3)
    val avg2 = r6((math.log(4.0 / 6) + math.log(2.0 / 6)) / 2)
    assert(out(1L) === ((3L, avg1, r6(math.exp(-avg1)))))
    assert(out(2L) === ((2L, avg2, r6(math.exp(-avg2)))))
    // partitioning invariance: rounded means are a pure function of the data
    val again = graft.llm.TextStats.lmPerplexity(docs.repartition(13))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again === out)
  }

  test("bm25: two-phase result equals a direct single-window top-k") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val terms = Seq("join", "filter")
    val got = graft.llm.TextStats.bm25(docs, terms, k = 7)
      .select("term", "rank", "doc_id").as[(String, Long, Long)].collect().toSet
    // direct: global window only (correct by definition, unscalable shape)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(col("score").desc, col("doc_id"))
    val direct = graft.llm.TextStats.bm25(docs, terms, k = Int.MaxValue)
      .withColumn("rk2", row_number().over(w)).filter(col("rk2") <= 7)
      .select("term", "rk2", "doc_id").as[(String, Int, Long)].collect()
      .map { case (t, r, d) => (t, r.toLong, d) }.toSet
    assert(got === direct)
  }
}
