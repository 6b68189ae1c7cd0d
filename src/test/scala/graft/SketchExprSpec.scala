package graft

import org.apache.spark.sql.functions._

import graft.functions.{BandHashes, CharNgramHashes, MinHashSig, NGramHashes,
  NGramHashesAll, NGramHashesPos, SimHashFp, TrigramHashes, WinnowFingerprint}

/** Edge cases + codegen/interpreted parity for the sketch expressions. */
class SketchExprSpec extends SparkSpec {
  import spark.implicits._

  private def noCodegen[T](f: => T): T = {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try f finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("kmv_minima aggregator: set semantics, bounded buffer, merge-order-free, SQL face") {
    import spark.implicits._
    import graft.functions.KmvMinima
    val agg = new KmvMinima(4)
    // reduce: insert-sorted, distinct, bounded at k
    val buf = Seq("c", "a", "c", "b", "e", "d", "a").foldLeft(agg.zero)(agg.reduce)
    assert(buf.toSeq == Seq("a", "b", "c", "d"))
    // anything >= current kth is dropped; something smaller displaces
    assert(agg.reduce(buf, "z").toSeq == Seq("a", "b", "c", "d"))
    assert(agg.reduce(buf, "aa").toSeq == Seq("a", "aa", "b", "c"))
    // merge: bounded sorted set-union, commutative
    val other = Seq("ab", "b", "f").foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(buf, other).toSeq == agg.merge(other, buf).toSeq)
    assert(agg.merge(buf, other).toSeq == Seq("a", "ab", "b", "c"))
    // the aggregate face agrees with the plan-level tournament result:
    // k smallest distinct md5s per source
    val docs = (0 until 50).map(i => (s"src${i % 3}", s"v$i")).toDF("source", "v")
      .select($"source", org.apache.spark.sql.functions.md5($"v").as("h"))
    graft.GraftFunctions.registerAll(spark)
    docs.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT source, kmv_minima(h) AS m FROM kmv_in GROUP BY source")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val expected = docs.collect().groupBy(_.getString(0)).map { case (s0, rows) =>
      s0 -> rows.map(_.getString(1)).distinct.sorted.take(256).toSeq
    }
    assert(viaSql.keySet == expected.keySet)
    expected.foreach { case (s0, want) => assert(viaSql(s0) == want, s0) }
  }

  test("kmv_minima survives ObjectHashAggregate's sort-based fallback (>128 groups/task)") {
    // the r16 KMV rewrite runs the operators' k-minima selection through
    // this aggregate; past spark.sql.objectHashAggregate.sortBased.
    // fallbackThreshold (default 128) distinct groups in one task, the
    // partial aggregate SPILLS to sort-based execution, serializing the
    // Array[String] buffer mid-stream — a path 20-source gate data never
    // exercises. 300 groups forced into one partition must land on the
    // brute-force per-group answer exactly.
    import spark.implicits._
    graft.GraftFunctions.registerAll(spark)
    val k = 8
    val rows = (0 until 300).flatMap { g =>
      (0 until 40).map(i => (s"g$g", s"v${(i * 7 + g) % 25}"))
    }
    val df = rows.toDF("source", "v")
      .select($"source", md5($"v").as("h"))
      .repartition(1) // all 300 groups through ONE partial-agg task
    // belt and braces: force the fallback at 2 hash-map keys so the test
    // can't silently stop covering it if the default threshold moves
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "2")
    val got =
      try df.groupBy("source")
        .agg(graft.functions.KmvMinima.minima(col("h"), k).as("m"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      finally spark.conf.set(key, prev)
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(v => org.apache.commons.codec.digest.DigestUtils.md5Hex(v._2))
        .distinct.sorted.take(k).toSeq
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (g, w) => assert(got(g) == w, g) }
  }

  test("trigram_hashes: <3 tokens -> empty; duplicates dedup; order matters") {
    val df = Seq(
      (1L, Seq("a", "b")),                       // too short
      (2L, Seq("a", "b", "c")),                  // one trigram
      (3L, Seq("a", "b", "c", "a", "b", "c")),   // windows repeat → dedup
      (4L, Seq("c", "b", "a"))                   // different order ≠ (2)
    ).toDF("id", "toks")
    val got = df.select(col("id"), TrigramHashes(col("toks")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).length == 1)
    // abc,bca,cab,abc → 3 distinct
    assert(got(3L).length == 3 && got(3L).contains(got(2L).head))
    assert(got(4L).length == 1 && got(4L) != got(2L))
  }

  test("minhash_sig: k slots, element order irrelevant, monotone under union") {
    val df = Seq(
      (1L, Seq(10L, 20L, 30L)),
      (2L, Seq(30L, 10L, 20L)),   // same set, different order
      (3L, Seq(10L, 20L, 30L, 40L))
    ).toDF("id", "hs")
    val got = df.select(col("id"), MinHashSig(col("hs"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L).length == 8)
    assert(got(1L) == got(2L), "signature is a set function")
    // adding elements can only lower each min slot
    assert(got(3L).zip(got(1L)).forall { case (u, v) => u <= v })
  }

  test("simhash: identical token multisets agree; codegen matches interpreted") {
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),
      (3L, "entirely different words here")
    ).toDF("id", "text")
    def run() = df.select(col("id"), SimHashFp(split(col("text"), " ")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val on = run()
    val off = noCodegen(run())
    assert(on == off, "codegen and interpreted must agree")
    assert(on(1L) == on(2L) && on(1L) != on(3L))
  }

  test("minhash_sig and trigram_hashes codegen parity") {
    val df = Seq((1L, Seq("w1", "w2", "w3", "w4"))).toDF("id", "toks")
    def run() = df.select(
        MinHashSig(TrigramHashes(col("toks")), 16).as("s"))
      .head().getSeq[Long](0)
    val on = run()
    assert(on == noCodegen(run()) && on.length == 16)
  }

  test("char_ngram_hashes: shorter-than-n empty; set semantics; multibyte chars; parity") {
    val df = Seq(
      (1L, "abcd"),          // < 5 chars → empty
      (2L, "abcde"),         // exactly one gram
      (3L, "abcdeabcde"),    // repeated grams dedup (6 windows, 5 distinct: abcde,bcdea,cdeab,deabc,eabcd + abcde again)
      (4L, "héllö wörld"),   // multibyte: code points, not bytes
      (5L, "edcba")          // different gram than (2)
    ).toDF("id", "text")
    def run() = df.select(col("id"), CharNgramHashes(col("text"), 5).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = run()
    assert(got(1L).isEmpty)
    assert(got(2L).length == 1)
    assert(got(3L).length == 5 && got(3L).contains(got(2L).head))
    assert(got(4L).length == "héllö wörld".length - 4)
    assert(got(5L).length == 1 && got(5L) != got(2L))
    assert(got == noCodegen(run()), "codegen and interpreted must agree")
    // sorted-distinct contract (the band/verify stages rely on set semantics)
    got.values.foreach(h => assert(h == h.distinct.sorted))
  }

  test("band_hashes: B keys, slice-sensitive, band-index-sensitive; parity") {
    val sig1 = Seq.tabulate(16)(i => i.toLong)
    val sig2 = sig1.updated(0, 99L)    // differs only in band 0's slice
    val df = Seq((1L, sig1), (2L, sig2)).toDF("id", "sig")
    def run() = df.select(col("id"), BandHashes(col("sig"), 4, 4).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = run()
    assert(got(1L).length == 4)
    assert(got(1L).distinct.length == 4, "distinct slices must give distinct keys")
    assert(got(1L).head != got(2L).head && got(1L).tail == got(2L).tail,
      "only the touched band's key changes")
    assert(got == noCodegen(run()))
    // equal slices in different bands must not collide (band idx is mixed in)
    val flat = Seq((3L, Seq.fill(16)(7L))).toDF("id", "sig")
      .select(BandHashes(col("sig"), 4, 4)).head().getSeq[Long](0)
    assert(flat.distinct.length == 4)
  }

  test("winnow_fp: window-min selection invariants; parity") {
    val df = Seq(
      (1L, Seq("a", "b")),                      // < K tokens → empty
      (2L, Seq("a", "b", "c")),                 // one k-gram → one selection
      (3L, Seq("a", "b", "c", "d", "e", "f")),  // selections ⊆ k-gram hashes
      (4L, Seq("b", "a", "c"))                  // order-sensitive
    ).toDF("id", "toks")
    def run() = df.select(col("id"), WinnowFingerprint(col("toks")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val got = run()
    assert(got(1L).isEmpty)
    assert(got(2L).length == 1)
    assert(got(3L).nonEmpty && got(3L).length <= 4, "selections are window minima of 4 k-grams")
    assert(got(4L) != got(2L))
    got.values.foreach(fp => assert(fp == fp.distinct.sorted))
    assert(got == noCodegen(run()))
  }

  test("ngram_hashes: n=3 reproduces trigram_hashes bit-for-bit; short docs empty") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a", "b")),
      (3L, Seq("x", "x", "x", "x"))
    ).toDF("id", "toks")
    val both = df.select(col("id"),
      NGramHashes(col("toks"), 3).as("n3"),
      TrigramHashes(col("toks")).as("t3"),
      NGramHashes(col("toks"), 8).as("n8"))
      .collect().map(r =>
        (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2), r.getSeq[Long](3)))
    both.foreach { case (id, n3, t3, n8) =>
      assert(n3 == t3, s"doc $id: ngram(3) != trigram")
      assert(n8.isEmpty, "below-n docs have no grams")
    }
    assert(both.find(_._1 == 3L).get._2.length == 1, "repeated grams dedup")
  }

  test("ngram_hashes_all: sorted with multiplicity; distinct set equals ngram_hashes") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a")), // bigrams ab,ba,ab,ba -> 2 distinct x2
      (2L, Seq("a")),                     // below n -> empty
      (3L, Seq("x", "x", "x", "x"))       // one gram, multiplicity 3
    ).toDF("id", "toks")
    def run() = df.select(col("id"),
      NGramHashesAll(col("toks"), 2).as("all"),
      NGramHashes(col("toks"), 2).as("dst"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    val got = run()
    assert(got(1L)._1.length == 4 && got(1L)._2.length == 2)
    assert(got(1L)._1.sorted == got(1L)._1, "hashesAll is sorted")
    assert(got(1L)._1.distinct == got(1L)._2, "distinct of all == ngram_hashes")
    assert(got(2L)._1.isEmpty)
    assert(got(3L)._1.length == 3 && got(3L)._1.distinct.length == 1)
    assert(got == noCodegen(run()))
  }

  test("ngram_hashes_pos: position-aligned; sorted copy equals ngram_hashes_all") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a")), // bigrams at 0..3: ab ba ab ba
      (2L, Seq("a")),
      (3L, Seq("x", "x", "x", "x"))
    ).toDF("id", "toks")
    def run() = df.select(col("id"),
      NGramHashesPos(col("toks"), 2).as("pos"),
      NGramHashesAll(col("toks"), 2).as("all"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getSeq[Long](2)))).toMap
    val got = run()
    val (pos1, all1) = got(1L)
    assert(pos1.length == 4, "one hash per gram position")
    assert(pos1(0) == pos1(2) && pos1(1) == pos1(3), "equal grams hash equal")
    assert(pos1(0) != pos1(1), "ab != ba (positional chain)")
    assert(pos1.sorted == all1, "sorted pos == hashesAll")
    assert(got(2L)._1.isEmpty, "below-n docs have no grams")
    assert(got(3L)._1.distinct.length == 1)
    assert(got == noCodegen(run()))
  }

  test("all token-array kernels hash null elements as empty string, never NPE") {
    GraftFunctions.registerAll(spark)
    def run(fn: String): Seq[org.apache.spark.sql.Row] = spark.sql(
      s"""SELECT $fn AS a,
         |       ${fn.replace("CAST(NULL AS STRING)", "''")} AS b""".stripMargin)
      .collect().toSeq
    for (call <- Seq(
        "trigram_hashes(array('a', CAST(NULL AS STRING), 'b', 'c'))",
        "ngram_hashes(array('a', CAST(NULL AS STRING), 'b', 'c'), 2)",
        "simhash_fp(array('a', CAST(NULL AS STRING), 'b'))")) {
      val r = run(call)
      assert(r.head.get(0) == r.head.get(1), s"$call: null != '' result")
    }
  }

  test("winnow_fp: null tokens hash as empty string, never NPE (ADVICE r3)") {
    // reachable through the SQL-registered function over user arrays
    // (split() output never contains nulls, but user arrays may)
    GraftFunctions.registerAll(spark)
    val withNull = spark.sql(
      "SELECT winnow_fp(array('a', CAST(NULL AS STRING), 'b', 'c')) AS fp")
      .head().getSeq[Long](0)
    val withEmpty = spark.sql(
      "SELECT winnow_fp(array('a', '', 'b', 'c')) AS fp")
      .head().getSeq[Long](0)
    assert(withNull == withEmpty)
    assert(withNull.nonEmpty)
  }

  test("word_trigram_md5: distinct-set parity with the composed split/slice/md5 plan") {
    import graft.functions.WordTrigramMd5
    // adversarial shapes: repeated/leading/trailing spaces (empty tokens),
    // multibyte UTF-8, dup grams, short docs, empty string
    val fixed = Seq(
      "a b c d e", "a  b c", " a b c", "a b c ", "a a a a a",
      "café naïve über wörter", "one two", "one", "",
      "x y z x y z x y z", "  ", "a b  c  d")
    val rnd = new scala.util.Random(7)
    val alphabet = Seq("tok", "x", "", "café", "longer-token", "7")
    val random = (0 until 60).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => alphabet(rnd.nextInt(alphabet.size)))
        .mkString(" ")
    }
    val docs = (fixed ++ random).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaKernel = docs
      .select($"doc_id", explode(WordTrigramMd5($"text")).as("h"))
      .distinct()
    val w = split($"text", " ")
    val grams = when(size($"w") >= 3,
      transform(sequence(lit(0), size($"w") - 3),
        i => concat_ws(" ", slice($"w", i + 1, lit(3))))).otherwise(array())
    val viaPlan = docs
      .select($"doc_id", w.as("w"))
      .select($"doc_id", explode(grams).as("g"))
      .select($"doc_id", md5($"g").as("h"))
      .distinct()
    assert(viaKernel.exceptAll(viaPlan).isEmpty && viaPlan.exceptAll(viaKernel).isEmpty)
    // interpreted path agrees with codegen
    val cg = viaKernel.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val interp = noCodegen {
      docs.select($"doc_id", explode(WordTrigramMd5($"text")).as("h"))
        .distinct().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    }
    assert(cg == interp)
    // null text explodes to zero rows, same as the composed plan
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(nulls.select(explode(WordTrigramMd5($"text"))).count() == 0L)
  }

  test("cm_cells: bit parity with the composed md5/substring/conv/pmod plan") {
    import graft.functions.CmCells
    // the r17 count-min cell kernel must reproduce the l64/m34 derivation
    // exactly for every (depth, width) in use and for adversarial tokens:
    // empty, multibyte UTF-8, long, digits, punctuation
    val toks = Seq("", "a", "the", "café", "ünïcode-тест", "7", ":",
      "0:prefix-collision", "a-very-much-longer-token-string-here",
      "é中文") ++
      (0 until 200).map(i => s"tok$i")
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "tok")
    for ((depth, width) <- Seq((4, 1024), (2, 16), (5, 3))) {
      val viaKernel = df.select($"id", explode(CmCells($"tok", depth, width)).as("p"))
        .select($"id", $"p.r", $"p.cell")
      val viaPlan = df.select($"id", explode(array((0 until depth).map { r =>
          struct(lit(r).as("r"),
            pmod(conv(substring(md5(concat(lit(s"$r:"), $"tok")), 1, 15), 16, 10)
              .cast("long"), lit(width.toLong)).as("cell"))
        }: _*)).as("p"))
        .select($"id", $"p.r", $"p.cell")
      val k = viaKernel.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val c = viaPlan.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(k == c, s"depth=$depth width=$width diverged")
      // interpreted path agrees with codegen
      val interp = noCodegen {
        df.select($"id", explode(CmCells($"tok", depth, width)).as("p"))
          .select($"id", $"p.r", $"p.cell")
          .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      }
      assert(k == interp)
    }
    // the flat bloom-positions face: same derivation, no row index
    import graft.functions.BloomPositions
    for ((nh, bits) <- Seq((3, 4096), (5, 64))) {
      val viaKernel = df.select($"id", explode(BloomPositions($"tok", nh, bits)).as("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val viaPlan = df.select($"id", explode(array((0 until nh).map { i =>
          pmod(conv(substring(md5(concat(lit(s"$i:"), $"tok")), 1, 15), 16, 10)
            .cast("long"), lit(bits.toLong))
        }: _*)).as("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(viaKernel == viaPlan, s"nh=$nh bits=$bits diverged")
    }
  }

  test("kmvSetOps array algebra: bit parity with the r16 row/window pair algebra") {
    import org.apache.spark.sql.expressions.Window
    import graft.llm.TextStats
    // the r17 shape computes the per-pair statistics as array expressions
    // over the per-source minima lists; this reference re-runs the r16
    // exploded-row shape (union-tag → group → row_number window → sizes
    // join → aggregate) over the SAME minima state (kmvDelta) and must
    // agree bit-for-bit, doubles included. k=8 so both regimes (n_m < k
    // and n_m >= k) appear among the pairs.
    val k = 8
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = ((0 until 120).map { i =>
      val src = s"src${i % 5}"
      val words = (0 until 4 + rnd.nextInt(10))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (src, s"d$i", words)
    } ++ Seq( // sub-k sources: 1 and 2 distinct trigrams → pairs with n_m < k
      ("tiny1", "t1", "w0 w1 w2"),
      ("tiny2", "t2", "w0 w1 w2 w3"))).toDF("source", "doc_id", "text")
    val got = TextStats.kmvSetOps(docs, k).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    // reference: the r16 implementation, verbatim algebra
    val minima = TextStats.kmvDelta(docs, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val srcs = minima.select(col("source")).distinct()
    val pairs = srcs.select(col("source").as("source_a"))
      .crossJoin(srcs.select(col("source").as("source_b")))
      .filter(col("source_a") < col("source_b"))
    val phA = pairs.join(minima.withColumnRenamed("source", "source_a"),
      Seq("source_a")).withColumn("side_a", lit(1))
    val phB = pairs.join(minima.withColumnRenamed("source", "source_b"),
      Seq("source_b")).withColumn("side_a", lit(0))
    val merged = phA.select(col("source_a"), col("source_b"), col("h"), col("side_a"))
      .unionByName(phB.select(col("source_a"), col("source_b"), col("h"), col("side_a")))
      .groupBy("source_a", "source_b", "h")
      .agg(max(col("side_a")).as("in_a"), max(lit(1) - col("side_a")).as("in_b"))
    val wp = Window.partitionBy(col("source_a"), col("source_b")).orderBy(col("h"))
    val ranked = merged.withColumn("rn", row_number().over(wp))
    val sizes = ranked.groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_m"))
      .withColumn("k_used", least(lit(k.toLong), col("n_m")))
    val top = ranked.join(sizes, Seq("source_a", "source_b"))
      .filter(col("rn") <= col("k_used"))
    val kmvRefEst = lit((k - 1).toDouble) * lit(1152921504606846976.0) /
      conv(substring(col("kth_h"), 1, 15), 16, 10).cast("long").cast("double")
    val stats = top.groupBy("source_a", "source_b", "n_m", "k_used")
      .agg(sum((col("in_a") * col("in_b")).cast("long")).as("shared_minima"),
        max(when(col("rn") === col("k_used"), col("h"))).as("kth_h"))
    val unionEst = when(col("n_m") < k, col("n_m").cast("double"))
      .otherwise(kmvRefEst)
    val jaccEst = col("shared_minima").cast("double") / col("k_used").cast("double")
    val want = stats
      .select(col("source_a"), col("source_b"), col("k_used"),
        col("shared_minima"), unionEst.as("kmv_union_est"),
        jaccEst.as("kmv_jacc_est"), (jaccEst * unionEst).as("kmv_inter_est"))
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSeq
    minima.unpersist()
    assert(got.nonEmpty && got == want)
    // both n_m regimes actually exercised: full sketches (k_used == k)
    // and sub-k pairs (k_used < k, the exact-union branch)
    assert(got.exists(_._3 == k.toLong))
    assert(got.exists(_._3 < k.toLong))
  }
}
