package graft

import org.apache.spark.sql.functions._

import graft.llm._

/** LLM-data-pipeline operators (graft.llm) on the sf0.001 testdata. */
class LlmSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf())
  private def embs = Tables.embeddings(spark, sf())

  test("minhash LSH finds exactly the pairs exact Jaccard finds (recall 1)") {
    // ground truth: all-pairs exact trigram Jaccard >= 0.8 (small sf only)
    val sh = TextDedup.shingled(docs).select(col("doc_id"), col("shingles"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb"))
    val exact = a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("j", col("inter") * lit(1.0) / (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("j") >= 0.8)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = TextDedup.minhashNearDup(docs)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(exact.nonEmpty, "testdata should contain planted near-dup pairs")
    assert(lsh === exact)
  }

  test("char-ngram Jaccard LSH finds exactly the pairs exact gram Jaccard finds") {
    val n = 5
    val grams = docs.select(col("doc_id"),
      when(length(col("text")) >= n,
        array_distinct(transform(sequence(lit(1), length(col("text")) - (n - 1)),
          i => col("text").substr(i, lit(n)))))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)")).as("g"))
    val a = grams.select(col("doc_id").as("doc_a"), col("g").as("ga"))
    val b = grams.select(col("doc_id").as("doc_b"), col("g").as("gb"))
    val exact = a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .withColumn("j", col("inter") * lit(1.0) / (size(col("ga")) + size(col("gb")) - col("inter")))
      .filter(col("j") >= 0.7)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val lsh = TextDedup.ngramJaccardNearDup(docs)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh === exact)
  }

  test("winnow fingerprint: deterministic, near-dups overlap, short docs empty") {
    import spark.implicits._
    val fpOf = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("doc_id"),
        graft.functions.WinnowFingerprint(split(col("text"), " ")).as("fp"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sample = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"),
      (2L, "the quick brown fox jumps over the lazy dog and runs far away tonight"),
      (3L, "completely different content with no shared trigram windows at all here"),
      (4L, "too short")) // < 3 tokens → empty fingerprint
    val fps = fpOf(sample.toDF("doc_id", "text"))
    val fps2 = fpOf(sample.toDF("doc_id", "text"))
    assert(fps == fps2, "fingerprints must be deterministic")
    assert(fps(4L).isEmpty)
    assert(fps(1L).nonEmpty && fps(1L) == fps(1L).distinct.sorted)
    def overlap(x: Seq[Long], y: Seq[Long]) =
      x.toSet.intersect(y.toSet).size * 1.0 / math.max(x.toSet.union(y.toSet).size, 1)
    assert(overlap(fps(1L), fps(2L)) >= 0.5,
      s"near-identical docs must share most selected hashes: ${overlap(fps(1L), fps(2L))}")
    assert(overlap(fps(1L), fps(3L)) == 0.0)
  }

  test("duplicate-collapse expansion: replicated corpus yields the exact expanded pairs") {
    // duplicate every doc (id + 10_000): the collapsed LSH must emit, for
    // each original pair (a,b), all four cross pairs, plus (d, d+10k)
    // intra pairs for every doc with a nonempty gram set — identical to
    // what the uncollapsed pipeline would produce, at 1/4 the verify cost
    import org.apache.spark.sql.functions._
    val offset = 10000L
    val doubled = docs.select("doc_id", "text")
      .unionByName(docs.select((col("doc_id") + offset).as("doc_id"), col("text")))
    val base = TextDedup.minhashNearDup(docs)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = TextDedup.minhashNearDup(doubled)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shingledDocs = TextDedup.shingled(docs)
      .filter(size(col("shingles")) > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectedCross = base.flatMap { case (a, b) =>
      Set((a, b), (a, b + offset), (b, a + offset), (a + offset, b + offset))
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
    }
    // exact-duplicate token sets in the ORIGINAL corpus also pair with
    // each other's twins; restrict the strong assertion to intra + cross
    assert(base.nonEmpty)
    assert(got.filter(p => p._1 < offset && p._2 < offset) == base,
      "restriction to original ids must equal the original output")
    shingledDocs.foreach { d =>
      assert(got.contains((d, d + offset)), s"missing twin pair for doc $d")
    }
    assert(expectedCross.subsetOf(got), "cross-pair expansion incomplete")

    // simhash path collapses on the fingerprint the same way
    val simBase = TextDedup.simhashNearDup(docs)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simGot = TextDedup.simhashNearDup(doubled)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simGot.filter(p => p._1 < offset && p._2 < offset) == simBase)
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { d =>
      assert(simGot.contains((d, d + offset)), s"missing simhash twin pair for doc $d")
    }
  }

  test("minhash hot-bucket guard bounds pair blow-up from mass duplication") {
    // 1000 copies of one boilerplate doc would generate ~500k candidate
    // pairs per band without the guard; with it, every viral bucket
    // exceeds MinhashBucketCap and is dropped before pair generation,
    // while organic near-dup pairs in the same table still surface
    import spark.implicits._
    val viral = (1L to 1000L).map(i =>
      (i, "breaking news subscribe to our channel for more daily updates and offers today"))
    val organic = Seq(
      (2001L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2002L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3001L, "completely unrelated text about spark catalyst expression codegen internals"))
    val docs = (viral ++ organic).toDF("doc_id", "text")
    val pairs = TextDedup.minhashNearDup(docs)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // bounded: no pair may involve a viral doc (their buckets are capped);
    // the organic near-dup pair must still be found via its own bucket
    assert(pairs.forall { case (a, b) => a > 1000 && b > 1000 },
      s"viral bucket leaked pairs: ${pairs.take(5).toList}")
    assert(pairs.toSet == Set((2001L, 2002L)))
  }

  test("incremental dedup keeps only fingerprints new to corpus AND batch") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "c b a"),            // token set equals corpus doc 1 → dropped
      (11L, "new words here"),   // first of an intra-batch pair → kept
      (12L, "words new here"),   // same token set as 11 → dropped
      (13L, "unique other text") // genuinely new → kept
    ).toDF("doc_id", "text")
    val kept = TextDedup.exactDedupAgainst(corpus, incoming)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(11L, 13L), s"got $kept")
  }

  test("decontamination flags exactly the docs sharing a benchmark 8-gram") {
    import spark.implicits._
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val train = Seq(
      // embeds the benchmark's first 8-gram → contaminated, 1 hit
      (100L, "prefix words alpha beta gamma delta epsilon zeta eta theta more tail"),
      (101L, "completely different text with no overlap at all whatsoever here today"),
      // shares only a 7-gram prefix → clean at n = 8
      (102L, "alpha beta gamma delta epsilon zeta eta unrelated"))
      .toDF("doc_id", "text")
    val out = TextDedup.decontaminate(train, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((100L, 1L)), s"got $out")
  }

  test("winnow overlap: identical docs 1.0, containment high, unrelated absent, cap kills mass dup") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val golden = Seq(
      (1L, base.trim),
      (2L, base.trim),                                  // identical -> overlap 1.0
      (3L, (base + "omega psi chi phi upsilon tau").trim), // A pasted in B -> containment
      (4L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val pairs = TextDedup.winnowOverlapPairs(golden).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("overlap")).toMap
    assert(pairs((1L, 2L)) == 1.0, "identical docs share every fingerprint")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) >= 0.9,
      "contained doc scores vs the smaller set")
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
    // mass duplication: a fingerprint present in > WinnowHashCap docs is
    // dropped, so a 70-copy group forms NO pairs (exact-dedup's job)
    val mass = (1L to 70L).map(i => (i, base.trim)).toDF("doc_id", "text")
    assert(TextDedup.winnowOverlapPairs(mass).count() == 0)
  }

  test("exact dedup groups are real duplicate token-set groups") {
    val groups = TextDedup.exactDedup(docs).collect()
    assert(groups.nonEmpty)
    assert(groups.forall(_.getAs[Long]("n_copies") >= 2))
  }

  test("dedup clusters: components resolve to min-id labels, chains converge") {
    import spark.implicits._
    // two components — a triangle {1,2,3} and a LONG CHAIN 10–11–…–30
    // (diameter 20, forcing many propagation rounds) — plus a pair {40,41}
    val chain = (10L until 30L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (1L, 3L), (40L, 41L)) ++ chain)
      .toDF("doc_a", "doc_b")
    val out = TextDedup.dedupClusters(pairs).collect()
    val lbl = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(lbl(_) == 1L))
    assert((10L to 30L).forall(lbl(_) == 10L))
    assert(Seq(40L, 41L).forall(lbl(_) == 40L))
    // keep exactly the component minima; member counts per component
    assert(out.filter(_.getAs[Boolean]("keep")).map(_.getLong(0)).toSet
      == Set(1L, 10L, 40L))
    val sizes = out.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(sizes(1L) == 3L && sizes(10L) == 21L && sizes(40L) == 2L)
    // corpus-level: clustering the real minhash pairs covers every paired doc
    val mp = TextDedup.minhashNearDup(docs).select("doc_a", "doc_b")
    val clustered = TextDedup.dedupClusters(mp)
    val docsInPairs = mp.select(col("doc_a").as("d"))
      .unionByName(mp.select(col("doc_b").as("d"))).distinct().count()
    assert(clustered.count() == docsInPairs)
  }

  test("minhashClusters: rep-granularity fusion is bit-identical to " +
      "dedupClusters(minhashNearDup), incl. replicated/over-cap/empty-gram groups") {
    import spark.implicits._
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getAs[Boolean]("keep"))).toSet
    def expanded(d: org.apache.spark.sql.DataFrame, cap: Long = TextDedup.SmallGraphEdgeCap) =
      rowsOf(TextDedup.dedupClusters(
        TextDedup.minhashNearDup(d).select("doc_a", "doc_b"), cap))
    def fused(d: org.apache.spark.sql.DataFrame, cap: Long = TextDedup.SmallGraphEdgeCap) =
      rowsOf(TextDedup.minhashClusters(d, cap))

    // real corpus, both execution paths
    assert(fused(docs) === expanded(docs))
    assert(fused(docs, cap = 0) === expanded(docs, cap = 0))

    // adversarial corpus: an over-cap identical group (> MinhashBucketCap
    // copies, intra expansion suppressed) whose rep near-dups a distinct
    // doc; an under-cap identical group with NO cross pair (intra clique
    // is its only edges); an empty-gram group (must appear in NO output);
    // and a singleton with no pairs
    val boiler = "breaking news subscribe to our channel for more daily updates and offers today"
    val overCap = (1L to (TextDedup.MinhashBucketCap + 4L)).map(i => (i, boiler))
    val nearRep = Seq((5001L,
      "breaking news subscribe to our channel for more daily updates and offers tonight"))
    val isolatedDup = Seq((6001L, "x"), (6002L, "x"), (6003L, "x")) // < 3 tokens → empty grams
    val soloDup = (7001L to 7003L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank today"))
    val lone = Seq((8001L, "completely unrelated text about catalyst expression codegen internals"))
    val adv = (overCap ++ nearRep ++ isolatedDup ++ soloDup ++ lone).toDF("doc_id", "text")
    val advFused = fused(adv)
    assert(advFused === expanded(adv))
    // the suppressed-intra group must still cluster via its rep's cross
    // pair when one exists; 5001 joins that component
    val advLbl = advFused.map(t => t._1 -> t._2).toMap
    if (advLbl.contains(5001L)) assert(advLbl(5001L) == 1L)
    // empty-gram copies appear nowhere; the intra-only group keeps its min
    assert(!advLbl.contains(6001L) && !advLbl.contains(6002L))
    assert(advLbl.get(7001L).contains(7001L) &&
      advFused.contains((7003L, 7001L, 3L, false)))
    assert(!advLbl.contains(8001L))

    // ScaleData-shaped replication: every doc doubled at a stride — the
    // exact shape whose member-pair expansion is quadratic in replica depth
    val offset = 10000L
    val doubled = docs.select("doc_id", "text")
      .unionByName(docs.select((col("doc_id") + offset).as("doc_id"), col("text")))
    assert(fused(doubled) === expanded(doubled))
  }

  test("chunk dedup: planted verbatim chunk found, intra-doc repeat is not cross-doc") {
    import spark.implicits._
    val span = (1 to TextDedup.ChunkTokens).map("t" + _).mkString(" ")
    val other = (1 to TextDedup.ChunkTokens).map("u" + _).mkString(" ")
    val corpus = Seq(
      (1L, span + " " + other),  // 2 chunks, first shared with doc 2
      (2L, span + " tail words only seven not a chunk"), // 1 chunk, shared
      (3L, other + " " + other), // same chunk TWICE in one doc — not cross-doc
      (4L, "short doc")          // under one chunk
    ).toDF("doc_id", "text")
    val out = TextDedup.chunkDedup(corpus).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((2L, 2L)))  // `span` shared with doc 2, `other` with doc 3
    assert(out(2L) == ((1L, 1L)))
    assert(out(3L) == ((2L, 2L))) // doc1 also holds `other` → cross-doc dup
    assert(out(4L) == ((0L, 0L)))
    // drop doc 1 and doc 3's intra-doc repeat is no longer a duplicate
    val solo = TextDedup.chunkDedup(corpus.filter(col("doc_id") =!= 1L))
      .filter(col("doc_id") === 3L).head()
    assert(solo.getLong(2) == 0L)
  }

  test("dedup clusters: empty pair list yields empty output, no iteration blow-up") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(TextDedup.dedupClusters(none).isEmpty)
  }

  test("dedup clusters match a union-find reference on seeded random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xC1C1)
    for (_ <- 1 to 3) {
      val n = 60
      val pairs = Seq.fill(50) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a < b) (a, b) else (b, a)
      }.filter(p => p._1 != p._2).distinct
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      // BOTH execution paths must land on the ground truth: the gated
      // driver union-find (default — these graphs are under the cap) and
      // the distributed min-label fixpoint (cap 0 forces it), so the
      // small-graph gate can never make the two paths drift apart
      val fast = TextDedup.dedupClusters(pairs.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = TextDedup.dedupClusters(pairs.toDF("doc_a", "doc_b"),
          smallGraphCap = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fast == expected)
      assert(dist == expected)
    }
  }


  test("dedupClusters: null-sided pairs drop uniformly on both paths (ADVICE r11)") {
    import spark.implicits._
    // previously the driver union-find NPE'd on nulls while the
    // distributed fixpoint silently shed them — same input, two answers
    val pairs = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (null, 3L), (4L, null), (null, null), (2L, 5L))
      .toDF("doc_a", "doc_b")
    def labels(cap: Long) = TextDedup.dedupClusters(pairs, smallGraphCap = cap)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = Map(1L -> 1L, 2L -> 1L, 5L -> 1L)
    assert(labels(TextDedup.SmallGraphEdgeCap) == expect, "driver path")
    assert(labels(0) == expect, "distributed path")
    // and the INCREMENTAL path (m37's maintainer) applies the same rule
    // in batch position 2+: a null-sided micro-batch pair must neither
    // insert a null label row nor strand its non-null side — maintained
    // state has to land exactly on the one-shot recompute
    val batch1 = Seq[(java.lang.Long, java.lang.Long)]((1L, 2L))
      .toDF("doc_a", "doc_b")
    val batch2 = Seq[(java.lang.Long, java.lang.Long)](
      (null, 3L), (4L, null), (null, null), (2L, 5L)).toDF("doc_a", "doc_b")
    val (st1, _) = graft.operators.Graph.incrementalComponentsDelta(
      None, batch1)
    val (st2, _) = graft.operators.Graph.incrementalComponentsDelta(
      Some(st1), batch2)
    val maintained = st2.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained == expect,
      s"incremental path diverged on null pairs: $maintained")
  }

  test("simhash is deterministic and near-dup pairs respect the hamming bound") {
    val fp1 = TextDedup.simhash(docs).orderBy("doc_id").collect().map(_.getLong(1))
    val fp2 = TextDedup.simhash(docs).orderBy("doc_id").collect().map(_.getLong(1))
    assert(fp1.sameElements(fp2))
    val pairs = TextDedup.simhashNearDup(docs).collect()
    assert(pairs.forall(_.getAs[Int]("hamming") <= TextDedup.SimhashMaxHamming))
  }

  test("brute-force ANN returns k ranked neighbors per probe, no self-match") {
    val out = Similarity.annBrute(embs, probeMax = 5, k = 4).collect()
    assert(out.length === 5 * 4)
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
    val ranks = out.groupBy(_.getLong(0)).values.map(_.map(_.getInt(1)).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1, 2, 3, 4)))
  }

  test("LSH ANN neighbors are a subset of brute-force ordering within bucket") {
    val lsh = Similarity.annLsh(embs, probeMax = 10, k = 3).collect()
    assert(lsh.nonEmpty)
    // every (query, neighbor) must share the probe's bucket
    val buckets = Similarity.prepared(embs).select("vec_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lsh.forall(r => buckets(r.getLong(0)) == buckets(r.getLong(2))))
  }

  test("IVF ANN: neighbors come from probed cells; decent recall vs brute") {
    val ivf = Similarity.annIvf(embs, probeMax = 10, k = 3).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => r.getLong(0) != r.getLong(2)), "no self-match")
    // recall against brute-force top-3: IVF with nprobe=2 of 8 cells should
    // recover a majority of true neighbors on this data
    val brute = Similarity.annBrute(embs, probeMax = 10, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = ivf.map(r => (r.getLong(0), r.getLong(2))).count(brute)
    assert(hits * 2 >= brute.size, s"recall too low: $hits / ${brute.size}")
  }

  test("IVF persisted index answers probes identically to the inline path") {
    val idx = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/idx"
    Similarity.buildIvfIndex(embs, idx)
    val indexed = Similarity.annIvfIndexed(spark, idx, probeMax = 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val inline = Similarity.annIvf(embs, probeMax = 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(indexed == inline, "index and inline IVF must agree row-for-row")
    // the index is physically clustered by cell — one directory per
    // inverted list
    val cells = new java.io.File(idx).listFiles
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cells > 1 && cells <= Similarity.IvfCells)
  }

  test("semdedup: pruned iff a lower-id same-cell neighbor reaches tau (brute check)") {
    val tau = 0.4
    val out = Similarity.semDedup(embs, tau).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.map(_._1).distinct.length == out.length, "one row per vector")
    // brute-force recomputation in plain Scala
    val vecs = embs.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (j <- a.indices) { d += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cellOf = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, cell, pruned) =>
      val expect = vecs.keys.exists(y => y < id && cellOf(y) == cell &&
        cos(vecs(id), vecs(y)) >= tau)
      assert(pruned == expect, s"vec $id: pruned=$pruned, brute=$expect")
    }
    // the lowest id of every cell can never be pruned
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(!rows.minBy(_._1)._3)
    }
  }

  test("semdedup: exact-duplicate contraction is result-identical on a " +
      "replicated corpus (ScaleData shape: identical vectors, shifted ids)") {
    // three byte-identical copies of every vector (zero-norm ones
    // included) — every (cell, v) group is 3 deep, so the contracted
    // pair scan runs on a third of the rows while the output must match
    // the all-member rule exactly: copy-0 of each vector keeps the
    // original verdict, copies 1-2 are pruned by their own group min
    // (cosine 1 >= tau) unless zero-norm (never pruned, the l9 rule)
    val tau = 0.4
    val stride = 100000000L
    val rep = (0 until 3).map(i => embs.select(
        (col("vec_id") + lit(i * stride)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
    val out = Similarity.semDedup(rep, tau).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.length == embs.count() * 3, "one row per replicated vector")
    val vecs = rep.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (j <- a.indices) { d += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cellOf = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, cell, pruned) =>
      val expect = vecs.keys.exists(y => y < id && cellOf(y) == cell &&
        cos(vecs(id), vecs(y)) >= tau)
      assert(pruned == expect, s"vec $id: pruned=$pruned, brute=$expect")
    }
    // replicas of a nonzero vector are always pruned; zero-norm never
    val zeroIds = vecs.collect { case (id, v) if v.forall(_ == 0.0) => id }
    out.foreach { case (id, _, pruned) =>
      if (zeroIds.exists(z => z % stride == id % stride))
        assert(!pruned, s"zero-norm vec $id must never prune")
      else if (id >= stride)
        assert(pruned, s"replica $id has its copy-0 twin below it")
    }
  }

  test("cluster profile partitions the corpus and agrees with semdedup cells") {
    val prof = Similarity.clusterProfile(embs).collect()
    assert(prof.map(_.getLong(1)).sum == embs.count())
    prof.foreach(r => assert(r.getDouble(2) <= r.getDouble(3)))
    // cell sizes must match the semdedup assignment's
    val bySem = Similarity.semDedup(embs).groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(prof.map(r => r.getInt(0) -> r.getLong(1)).toMap == bySem)
  }

  test("embedding near-dup is symmetric-free and above threshold") {
    val pairs = Similarity.embeddingNearDup(embs, threshold = 0.3).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("l12 threshold contract: near-threshold char-gram pairs behave as documented") {
    // the ≥3-band vote misses a pair at exactly Jaccard 0.7 with p ≈ 0.9 %
    // (NgramMinBandMatches doc); the l12 oracle stays hash-green because
    // the shipped corpus has no pairs in the (0.3, 0.9) gap. This seeded
    // corpus puts pairs AT the boundary and pins the deterministic
    // behavior: no false positives ever, pairs ≥ 0.8 found, sub-threshold
    // pairs excluded by the exact verify regardless of banding.
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while rain falls" +
      " on the plain in spain every morning before dawn"
    val docs = Seq(
      1L -> base,
      // char-5-gram Jaccard vs doc 1: 0.746 — above threshold, inside the
      // band-vote's weak zone (per-band p = 0.31, miss p ≈ 2e-4)
      2L -> ("the quick brown fox jumps over the lazy dog while rain drops" +
        " on the plain in spain every evening before dawn"),
      // 0.697 — just BELOW threshold: candidates or not, verify excludes it
      3L -> ("the quick brown fox jumps over the lazy dog while rain falls" +
        " on the plain in spain every evening after sunset"),
      // 0.602 — well below
      4L -> ("the quick brown fox jumps over the lazy dog while hail falls" +
        " on the plain in spain every evening after dusk"),
      // 0.873 vs doc 1 — comfortably above: must be found (miss p < 1e-9)
      5L -> ("the quick brown fox jumps over the lazy dog while rain falls" +
        " on the plain in spain every evening before dawn"))
    def grams(s: String): Set[String] =
      (0 to s.length - 5).map(i => s.substring(i, i + 5)).toSet
    def jac(x: String, y: String): Double = {
      val (gx, gy) = (grams(x), grams(y))
      gx.intersect(gy).size.toDouble / gx.union(gy).size
    }
    val exact = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      j = jac(ta, tb) if j >= 0.7
    } yield (ia, ib) -> j).toMap
    val found = TextDedup.ngramJaccardNearDup(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // contract: never a false positive
    found.keys.foreach(p => assert(exact.contains(p), s"false positive $p"))
    found.foreach { case (p, j) => assert(math.abs(exact(p) - j) < 1e-9) }
    // pairs comfortably above the threshold must be found
    exact.filter(_._2 >= 0.8).keys
      .foreach(p => assert(found.contains(p), s"missed high-sim pair $p"))
    // the deterministic outcome for THIS corpus: every exact pair ≥ 0.7 is
    // found (the 0.746 pair survives the vote here; a corpus refresh that
    // lands a pair at ~0.70 may deterministically miss it — that is the
    // documented 0.9 % contract, not a regression)
    assert(found.keySet == exact.keySet, s"found=$found exact=$exact")
  }

  private def embBase: Array[Float] =
    Array.tabulate(64)(j => ((j * 37 + 11) % 101 - 50) / 50.0f)

  test("embedding hot-bucket guard bounds pair blow-up from mass near-duplication") {
    // 300 DISTINCT scalar multiples of one direction: identical sign
    // patterns, so all land in the same bucket of every band — without the
    // guard that is ~45k candidate pairs from one vector family; with it,
    // every such bucket exceeds EmbBucketCap and is dropped before any
    // pair forms. 300 EXACT copies of a second direction: the duplicate
    // collapse reduces them to one banding row, and intra expansion of a
    // group beyond the cap is suppressed. An organic duplicate pair of a
    // third direction must still surface (intra path, group of 2).
    import spark.implicits._
    val viralDistinct = (1 to 300).map(i =>
      (i.toLong, embBase.map(x => x * (1f + i / 1000f))))
    val neg = embBase.map(x => -x)
    val viralCopies = (1001 to 1300).map(i => (i.toLong, neg))
    val flip = embBase.zipWithIndex.map { case (x, j) => if (j % 2 == 0) -x else x }
    val organic = Seq((9001L, flip), (9002L, flip))
    val all = (viralDistinct ++ viralCopies ++ organic).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDup(all)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((9001L, 9002L)),
      s"viral family leaked pairs: ${pairs.take(5).toList} (n=${pairs.length})")
  }

  test("embedding banded LSH pairs a same-direction family below the cap") {
    // control for the guard test: 10 distinct scalar multiples (cosine
    // exactly 1 pairwise, one shared bucket per band, under the cap) must
    // produce all 45 pairs via the banded join + exact verify
    import spark.implicits._
    val fam = (1 to 10).map(i => (i.toLong, embBase.map(x => x * i)))
    val pairs = Similarity.embeddingNearDup(fam.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === 45 && pairs.toSet.size === 45)
  }

  test("split assignment is a pure key function — partitioning-invariant") {
    val one = TextStats.splitAssign(docs).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val other = TextStats.splitAssign(docs.repartition(13)).select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(one == other, "split must not depend on physical layout")
    val byName = one.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
  }

  test("shard assignment: partitioning-invariant, dense 0-based positions") {
    val one = TextStats.shardAssign(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val other = TextStats.shardAssign(docs.repartition(13)).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(one == other, "shard/order must not depend on physical layout")
    // within each shard, positions are exactly 0..n-1
    one.values.groupBy(_._1).foreach { case (_, members) =>
      val ps = members.map(_._2).toSeq.sorted
      assert(ps == (0L until ps.size))
    }
    assert(one.values.map(_._1).toSet.subsetOf((0 until 8).toSet))
  }

  test("token budget keeps best-quality docs first, overshoots by at most one doc") {
    import spark.implicits._
    val ws = (c: Char) => (1 to 10).map(i => s"$c$i").mkString(" ") // 10 tokens, 0 stopwords
    val half = "the a of and the " + (1 to 5).map(i => s"x$i").mkString(" ") // ratio 0.5
    val all = "the a of and the a of and the a" // ratio 1.0
    val corpus = Seq(
      (1L, "aa", ws('p')), (2L, "aa", half), (3L, "aa", all),
      (4L, "bb", ws('q'))).toDF("doc_id", "lang", "text")
    val out = TextStats.tokenBudget(corpus, budget = 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // lang aa: quality order d1 (0.0), d2 (0.5), d3 (1.0); cum 10, 20, 30 →
    // d1 starts at 0 < 15, d2 at 10 < 15 (kept, overshoots), d3 at 20 ≥ 15
    assert(out == Seq(("aa", 2L, 20L), ("bb", 1L, 10L)), s"got $out")
  }

  test("text stats are exact and complete") {
    val stats = TextStats.textStats(docs).collect()
    assert(stats.length === docs.count())
    assert(stats.forall { r =>
      val n = r.getAs[Int]("n_tokens"); val u = r.getAs[Int]("n_unique")
      n >= u && u >= 1 && math.abs(r.getAs[Double]("ttr") - u.toDouble / n) < 1e-15
    })
  }

  test("repetition stats: known-count docs, short-doc zeros, corpus sanity") {
    import spark.implicits._
    // "a b a b a b": bigrams [ab, ba, ab, ba, ab] -> n=5, top=3 ('a b'),
    // distinct=2 -> dup=3/5; trigrams [aba, bab, aba, bab] -> n=4,
    // distinct=2 -> dup=2/4
    val golden = Seq((1L, "a b a b a b"), (2L, "x"), (3L, "p q")).toDF("doc_id", "text")
    val r = TextStats.repetitionStats(golden).collect()
    val d1 = r.find(_.getLong(0) == 1L).get
    assert(d1.getAs[Long]("n_bigrams") == 5L)
    assert(d1.getAs[Long]("top_bigram_n") == 3L)
    assert(d1.getAs[Double]("top_bigram_frac") == 3.0 / 5)
    assert(d1.getAs[Double]("dup_bigram_frac") == 3.0 / 5)
    assert(d1.getAs[Double]("dup_trigram_frac") == 2.0 / 4)
    // single token: no bigrams at all -> all zeros, no division error
    val d2 = r.find(_.getLong(0) == 2L).get
    assert(d2.getAs[Long]("n_bigrams") == 0L &&
      d2.getAs[Double]("top_bigram_frac") == 0.0 &&
      d2.getAs[Double]("dup_trigram_frac") == 0.0)
    // two tokens: one bigram, trivially the mode, nothing duplicated
    val d3 = r.find(_.getLong(0) == 3L).get
    assert(d3.getAs[Long]("n_bigrams") == 1L &&
      d3.getAs[Long]("top_bigram_n") == 1L &&
      d3.getAs[Double]("dup_bigram_frac") == 0.0)
    // corpus-wide invariants: frac bounds, mode >= dup implication
    val all = TextStats.repetitionStats(docs).collect()
    assert(all.forall { x =>
      val tf = x.getAs[Double]("top_bigram_frac")
      val df = x.getAs[Double]("dup_bigram_frac")
      tf >= 0.0 && tf <= 1.0 && df >= 0.0 && df < 1.0 &&
        (df == 0.0 || x.getAs[Long]("top_bigram_n") >= 2L)
    })
  }

  test("topNgrams: exact heavy-hitter counts, boundary ties all kept, rank stable") {
    import spark.implicits._
    val golden = Seq(
      (1L, "the cat sat on the mat"),   // bigrams: the-cat cat-sat sat-on on-the the-mat
      (2L, "the cat sat again"),        // the-cat cat-sat sat-again
      (3L, "the cat"),                  // the-cat
      (4L, "on the mat")                // on-the the-mat
    ).toDF("doc_id", "text")
    val top = TextStats.topNgrams(golden, n = 2, k = 3).collect()
    assert(top.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq == Seq(
      (1L, "the cat", 3L), (2L, "cat sat", 2L), (3L, "on the", 2L)))
    // k cutting into a tie plateau: rank is (count desc, gram asc), exact
    val top5 = TextStats.topNgrams(golden, n = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(top5 == Seq((1L, "the cat", 3L), (2L, "cat sat", 2L), (3L, "on the", 2L),
      (4L, "the mat", 2L), (5L, "sat again", 1L)))
    // empty corpus: no rows, no NPE from the null threshold
    assert(TextStats.topNgrams(golden.filter(lit(false)), n = 2, k = 3).count() == 0L)
  }

  test("tfidf keywords: rare repeated terms beat common ones, ties on word") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "common common rare rare rare common"),   // rare: tf=3 df=1
      (2L, "common words words zz"),
      (3L, "common zz zz aa")
    ).toDF("doc_id", "text")
    val out = TextStats.tfidfKeywords(corpus, k = 2).collect()
    val top1 = out.filter(r => r.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(top1(1L) == "rare")   // 3*3/1 = 9 beats common 3*3/3 = 3
    assert(top1(2L) == "words")  // 2*3/1 = 6 beats zz 1*3/2 = 1.5
    assert(top1(3L) == "aa")     // zz (2*3/2) ties aa (1*3/1) at 3.0 → word asc
    // scores are exactly tf*N/df and ranks bounded by k
    out.foreach { r =>
      assert(r.getDouble(5) == r.getLong(3).toDouble * 3 / r.getLong(4))
    }
    assert(out.count(_.getLong(0) == 1L) == 2)
  }

  test("quality filter: each rule rejects its own violation, clean doc passes") {
    import spark.implicits._
    // varied tokens (a sentence repeated 5x would — correctly — trip the
    // duplicate-trigram rule); every 10th word a stopword
    val clean = Seq.tabulate(60)(i =>
      if (i % 10 == 0) "the" else s"word$i").mkString(" ")
    val corpus = Seq(
      (1L, clean),                                     // passes all rules
      (2L, "too few words here"),                      // n_tokens < 50
      (3L, Seq.fill(60)("extraordinarily").mkString(" ")), // mean word len > 10
      (4L, Seq.fill(60)("word").mkString(" ")),        // no stopwords + repetition
      (5L, clean + " " + Seq.fill(40)("spam ham").mkString(" ")) // top bigram
    ).toDF("doc_id", "text")
    val out = TextStats.qualityFilter(corpus).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("pass"))
    assert(!out(2L).getAs[Boolean]("pass") && out(2L).getAs[Int]("n_tokens") < 50)
    assert(!out(3L).getAs[Boolean]("pass") && out(3L).getAs[Double]("mean_word_len") > 10)
    assert(!out(4L).getAs[Boolean]("pass") && out(4L).getAs[Int]("stop_hits") < 2)
    assert(!out(5L).getAs[Boolean]("pass") &&
      out(5L).getAs[Double]("top_bigram_frac") > 0.2)
  }

  test("langid predicts a language for every doc with fixed tiebreak") {
    import spark.implicits._
    val golden = Seq(
      (1L, "x", "the cat and the dog"),     // en markers
      (2L, "x", "der hund und die katze"),  // de markers
      (3L, "x", "le chat et la souris"),    // fr markers
      (4L, "x", "el gato y los perros"),    // es markers
      (5L, "x", "nothing matches here"))    // tie -> en priority
      .toDF("doc_id", "lang", "text")
    val out = TextStats.langId(golden).orderBy("doc_id")
      .select("predicted").collect().map(_.getString(0))
    assert(out.toSeq === Seq("en", "de", "fr", "es", "en"))
  }

  test("multimodal pipeline: stubbed decode is deterministic, plumbing is real") {
    val assets = Multimodal.assetsFromDocuments(spark, docs.limit(20))
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length === 20)
    assert(feats.forall(_.feature.length === Multimodal.FeatureDim))
    // deterministic: same payload -> same sha + feature
    val again = Multimodal.extractFeatures(assets).collect()
    assert(feats.sortBy(_.asset_id).zip(again.sortBy(_.asset_id))
      .forall { case (x, y) => x.content_sha == y.content_sha && x.feature.sameElements(y.feature) })
    // sha really is the payload hash
    val one = assets.filter(col("asset_id") === feats.head.asset_id).head()
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(one.media_bytes).map(b => f"$b%02x").mkString
    assert(feats.find(_.asset_id == one.asset_id).get.content_sha === sha)
  }

  test("media probe parses real container headers without codec libs") {
    import Multimodal.{probe, MediaProbe}
    // PNG: signature + IHDR with 512x384
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0, 0, 0, 1, 0x80, 8, 2, 0, 0, 0).map(_.toByte)
    assert(probe(png) == MediaProbe("png", Some(512), Some(384), None, None))
    // JPEG: SOI, APP0 (16 bytes), SOF0 with h=256 w=200
    val jpeg = (Array[Int](0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10) ++
      Array.fill(14)(0) ++
      Array[Int](0xFF, 0xC0, 0x00, 0x11, 0x08, 0x01, 0x00, 0x00, 0xC8, 0x03) ++
      Array.fill(12)(0) ++ Array[Int](0xFF, 0xD9)).map(_.toByte)
    assert(probe(jpeg) == MediaProbe("jpeg", Some(200), Some(256), None, None))
    // GIF89a 320x240 (little-endian dims)
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x40, 0x01, 0xF0, 0x00, 0, 0, 0, 0).map(_.toByte))
    assert(probe(gif) == MediaProbe("gif", Some(320), Some(240), None, None))
    // BMP 640x480 (dims at offsets 18/22, little-endian)
    val bmp = ("BM".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0) ++
      Array[Int](0x80, 0x02, 0, 0, 0xE0, 0x01, 0, 0).map(_.toByte))
    assert(probe(bmp) == MediaProbe("bmp", Some(640), Some(480), None, None))
    // WAV: stereo 44100 Hz
    val wav = ("RIFF".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0) ++
      "WAVEfmt ".getBytes("US-ASCII") ++
      Array[Int](16, 0, 0, 0, 1, 0, 2, 0, 0x44, 0xAC, 0, 0, 0, 0, 0, 0).map(_.toByte))
    assert(probe(wav) == MediaProbe("wav", None, None, Some(2), Some(44100)))
    // WAV whose fmt chunk is NOT first (broadcast-WAV style JUNK padding):
    // the chunk walk must find it, not read garbage at fixed offsets
    val wavJunk = ("RIFF".getBytes("US-ASCII") ++ Array.fill[Byte](4)(0) ++
      "WAVEJUNK".getBytes("US-ASCII") ++
      Array[Int](4, 0, 0, 0, 0x7F, 0x7F, 0x7F, 0x7F).map(_.toByte) ++
      "fmt ".getBytes("US-ASCII") ++
      Array[Int](16, 0, 0, 0, 1, 0, 1, 0, 0x40, 0x1F, 0, 0, 0, 0, 0, 0).map(_.toByte))
    assert(probe(wavJunk) == MediaProbe("wav", None, None, Some(1), Some(8000)))
    // top-down BMP: biHeight is stored negative; report the row count
    val bmpTopDown = ("BM".getBytes("US-ASCII") ++ Array.fill[Byte](16)(0) ++
      Array[Int](0x80, 0x02, 0, 0, 0x20, 0xFE, 0xFF, 0xFF).map(_.toByte))
    assert(probe(bmpTopDown) == MediaProbe("bmp", Some(640), Some(480), None, None))
    // garbage, truncation, empty: unknown, never an exception
    assert(probe("just some text".getBytes).format == "unknown")
    assert(probe(png.take(10)).format == "unknown")
    assert(probe(Array.emptyByteArray).format == "unknown")
    // and through the distributed path
    import spark.implicits._
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image", png, 0, 0),
      Multimodal.MediaAsset(2L, "audio", wav, 0, 0)).toDS()
    val probed = Multimodal.probeAssets(assets).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(probed == Map(1L -> "png", 2L -> "wav"))
  }

  test("JDK image decode: a real PNG yields grid-luminance features") {
    // left half black, right half white — no external codec libs, the
    // JDK's own ImageIO both writes and reads the PNG
    val img = new java.awt.image.BufferedImage(
      64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64)
      img.setRGB(x, y, if (x < 32) 0x000000 else 0xFFFFFF)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray
    val f = Multimodal.decodeImage(png).get
    assert(f.length == Multimodal.FeatureDim)
    for (gy <- 0 to 3; gx <- 0 to 3) {
      val v = f(gy * 4 + gx)
      if (gx < 2) assert(math.abs(v - (-1f)) < 1e-3, s"cell ($gx,$gy) = $v")
      else assert(math.abs(v - 1f) < 1e-3, s"cell ($gx,$gy) = $v")
    }
    // the decode chain uses the real decoder for PNG, the stub for text
    assert(Multimodal.decode(png).sameElements(f))
    val text = "plain text payload".getBytes("UTF-8")
    assert(Multimodal.decode(text).sameElements(Multimodal.decodeStub(text)))
  }

  test("JDK wav decode: synthesized PCM envelope lands in the right bins") {
    // 16-bit mono PCM, 8000 Hz: 800 silent samples then 800 at half scale
    val n = 1600
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until n).foreach(i => bb.putShort(if (i < n / 2) 0 else 16384))
    val wav = bb.array()
    val f = Multimodal.decodeWav(wav).get
    assert(f.length == Multimodal.FeatureDim)
    (0 until 8).foreach(b => assert(math.abs(f(b)) < 1e-3, s"bin $b = ${f(b)}"))
    (8 until 16).foreach(b => assert(math.abs(f(b) - 0.5f) < 1e-3, s"bin $b = ${f(b)}"))
    assert(Multimodal.decode(wav).sameElements(f))
  }

  test("pcm envelope: unsigned 16-bit midpoint is silence, not full scale") {
    // 0x8000 little-endian = unsigned silence; 0xC000 = half scale up
    val n = 16
    val bb = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => bb.putShort(if (i < n / 2) 0x8000.toShort else 0xC000.toShort))
    val f = Multimodal.pcmEnvelope(bb.array(), bits = 16,
      unsigned = true, bigEndian = false, dim = 16).get
    (0 until 8).foreach(b => assert(math.abs(f(b)) < 1e-6, s"bin $b = ${f(b)}"))
    (8 until 16).foreach(b => assert(math.abs(f(b) - 0.5f) < 1e-6, s"bin $b = ${f(b)}"))
    // signed interpretation of the same bytes would be full scale — the
    // pre-fix behavior the advisor flagged
    val g = Multimodal.pcmEnvelope(bb.array(), bits = 16,
      unsigned = false, bigEndian = false, dim = 16).get
    assert(g(0) == 1.0f)
    // big-endian unsigned round-trips the same envelope
    val be = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    (0 until n).foreach(i => be.putShort(if (i < n / 2) 0x8000.toShort else 0xC000.toShort))
    val h = Multimodal.pcmEnvelope(be.array(), bits = 16,
      unsigned = true, bigEndian = true, dim = 16).get
    assert(h.sameElements(f))
  }

  test("resize really rescales JDK-decodable images; others use the stub seam") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      100, 50, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val assets = Seq(
      Multimodal.MediaAsset(1L, "image", buf.toByteArray, 9999, 9999), // real PNG
      Multimodal.MediaAsset(2L, "image", "not an image".getBytes, 100, 50))
      .toDS()
    val out = Multimodal.resize(assets, maxW = 64, maxH = 64)
      .collect().map(a => a.asset_id -> a).toMap
    // real path: dims come from the DECODED pixels (100x50 → 64x32), not
    // the (deliberately wrong) declared dims, and the payload re-decodes
    assert(out(1L).declared_width == 64 && out(1L).declared_height == 32)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).media_bytes))
    assert(back.getWidth == 64 && back.getHeight == 32)
    // fallback path: declared dims drive the box fit
    assert(out(2L).declared_width == 64 && out(2L).declared_height == 32)
  }

  test("frame sampling yields n evenly spaced windows per asset") {
    val assets = Multimodal.assetsFromDocuments(spark, docs.limit(5))
    val frames = Multimodal.frameSample(assets, n = 4)
    assert(frames.count() === 20)
    assert(frames.groupBy("asset_id").count().collect().forall(_.getLong(1) == 4))
  }

  test("resize fits the declared box aspect-preserving, deterministic payload") {
    val assets = Multimodal.assetsFromDocuments(spark, docs.limit(20))
    val resized = Multimodal.resize(assets, maxW = 64, maxH = 64).collect()
    val orig = assets.collect().map(a => a.asset_id -> a).toMap
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val o = orig(r.asset_id)
      assert(r.declared_width <= 64 && r.declared_height <= 64)
      if (o.declared_width >= 8 && o.declared_height >= 8) {
        // aspect preserved within rounding (degenerate 1-px dims can't
        // hold aspect after integer rounding, so only check real boxes)
        val ar0 = o.declared_width.toDouble / o.declared_height
        val ar1 = r.declared_width.toDouble / r.declared_height
        assert(math.abs(ar0 - ar1) / ar0 < 0.2, s"aspect drifted: $ar0 vs $ar1")
        // payload shrinks with the area ratio (stub decimation is real
        // about the memory effect)
        if (r.declared_width < o.declared_width)
          assert(r.media_bytes.length < o.media_bytes.length)
      }
      assert(r.media_bytes.length >= 1)
    }
    // deterministic
    val again = Multimodal.resize(assets, maxW = 64, maxH = 64).collect()
      .map(a => a.asset_id -> a.media_bytes.toSeq).toMap
    assert(resized.forall(a => again(a.asset_id) == a.media_bytes.toSeq))
  }

  test("pii scrub: counts and redacts emails, phones, IPs; clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b-c@sub.example.org or x@y.io ph 415-555-0100 and 415.555.0101 from 192.168.0.1"),
      (2L, "no pii here, just words and numbers 12345"),
      (3L, "edge: ip 999.1.1.1 still matches the dotted-quad shape; v6 2001:db8::1 does not")
    ).toDF("doc_id", "text")
    val out = PiiScrub.scrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips")), r.getAs[String]("redacted"))).toMap
    assert(out(1L)._1 == ((2L, 2L, 1L)))
    assert(out(1L)._2 ==
      "mail <EMAIL> or <EMAIL> ph <PHONE> and <PHONE> from <IP>")
    assert(out(2L)._1 == ((0L, 0L, 0L)))
    assert(out(2L)._2 == "no pii here, just words and numbers 12345")
    assert(out(3L)._1 == ((0L, 0L, 1L)))
    assert(out(3L)._2.contains("<IP>") && !out(3L)._2.contains("999.1.1.1"))
  }

  test("stratified sample: k per stratum, deterministic, partitioning-invariant") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "strat")
    val a = TextStats.stratifiedSample(docs, "strat", k = 7)
      .select("strat", "rk", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.length == 21)
    assert(a.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == (1L to 7L)))
    // same sample regardless of input partitioning (the whole point)
    val b = TextStats.stratifiedSample(docs.repartition(13), "strat", k = 7)
      .select("strat", "rk", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.sorted.toSeq == b.sorted.toSeq)
    // and it matches the single-phase definition: global md5 order per stratum
    val want = (0L until 300L).groupBy(i => s"s${i % 3}").flatMap { case (s, ids) =>
      ids.sortBy(i => (java.security.MessageDigest.getInstance("MD5")
          .digest(i.toString.getBytes).map(b => f"$b%02x").mkString, i))
        .take(7).zipWithIndex.map { case (id, r) => (s, (r + 1).toLong, id) }
    }.toSet
    assert(a.toSet == want)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("dup-span removal: cross-doc chunks cut, intra-doc repeats kept, rewrite exact") {
    import spark.implicits._
    def toks(p: String) = (0 until 20).map(i => s"$p$i")
    val (a, b, c, d) = (toks("a"), toks("b"), toks("c"), toks("d"))
    val docs = Seq(
      (1L, (a ++ b).mkString(" ") + " t1 t2"), // shared A + own B + tail
      (2L, (a ++ c).mkString(" ")),            // shared A + own C
      (3L, (d ++ d).mkString(" ")),            // intra-doc repeat only → kept
      (4L, a.mkString(" "))                    // all tokens are the shared chunk
    ).toDF("doc_id", "text")
    val out = TextDedup.dupSpanRemoval(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_tok_after"), r.getAs[String]("kept_md5")))).toMap
    assert(out(1L) == ((2L, 1L, 22L, md5hex(b.mkString(" ") + " t1 t2"))))
    assert(out(2L) == ((2L, 1L, 20L, md5hex(c.mkString(" ")))))
    assert(out(3L) == ((2L, 0L, 40L, md5hex((d ++ d).mkString(" ")))))
    assert(out(4L) == ((1L, 1L, 0L, md5hex(""))))
  }

  test("seq pack: per-shard token space is contiguous and seq spans are consistent") {
    val rows = TextStats.seqPack(docs).collect().map(r =>
      (r.getAs[Int]("shard"), r.getAs[Long]("start_tok"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("first_seq"), r.getAs[Long]("last_seq"),
        r.getAs[Long]("seq_offset"), r.getAs[Long]("n_seqs_spanned")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      // contiguous: each doc starts exactly where the previous ended
      sorted.sliding(2).foreach {
        case Array(p, n) => assert(p._2 + p._3 == n._2)
        case _ =>
      }
      assert(sorted.head._2 == 0L)
    }
    rows.foreach { case (_, start, n, first, last, off, span) =>
      assert(first == start / 512 && last == (start + n - 1) / 512)
      assert(off == start % 512 && span == last - first + 1)
    }
  }

  test("chunk windows: stride grid, truncated tail, full token coverage") {
    import spark.implicits._
    val docs = Seq((1L, (0 until 100).map(i => s"w$i").mkString(" ")),
      (2L, "only ten tokens here to stay below the window size")).toDF("doc_id", "text")
    val out = TextStats.chunkWindows(docs).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("win_id"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("n_win_tok"), r.getAs[String]("win_md5")))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(w => (w._3, w._4)).toSeq == Seq((0L, 64L), (48L, 52L)))
    assert(d1(0)._5 == md5hex((0 until 64).map(i => s"w$i").mkString(" ")))
    assert(d1(1)._5 == md5hex((48 until 100).map(i => s"w$i").mkString(" ")))
    // short doc: exactly one full-doc window
    assert(out.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, 0L, 10L, md5hex("only ten tokens here to stay below the window size"))))
    // coverage: windows tile every token index (win=64 ≥ stride=48)
    val covered = d1.flatMap(w => w._3 until (w._3 + w._4)).toSet
    assert(covered == (0L until 100L).toSet)
  }

  test("simpson diversity: known counts, run-length fold matches group-count definition") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a b"),        // counts a:2 b:1 → rp 2, simpson 2/6
      (2L, "a a a"),        // rp 6 → 1.0
      (3L, "x y z"),        // all unique → 0
      (4L, "t"),            // single token → simpson 0 by convention
      (5L, "b a b a b")     // a:2 b:3 → rp 2+6=8, n 5 → 8/20
    ).toDF("doc_id", "text")
    val out = TextStats.simpsonDiversity(d).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_unique"),
          r.getAs[Long]("repeat_pairs"), r.getAs[Double]("simpson")))).toMap
    assert(out(1L) == ((3L, 2L, 2L, 2.0 / 6)))
    assert(out(2L) == ((3L, 1L, 6L, 1.0)))
    assert(out(3L) == ((3L, 3L, 0L, 0.0)))
    assert(out(4L) == ((1L, 1L, 0L, 0.0)))
    assert(out(5L) == ((5L, 2L, 8L, 8.0 / 20)))
    // corpus sanity: the fold equals the explicit group-count definition
    val viaGroups = docs.limit(50).select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy("doc_id", "t").count()
      .groupBy("doc_id").agg(sum(col("count") * (col("count") - 1)).as("rp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rp")).toMap
    TextStats.simpsonDiversity(docs.limit(50)).collect().foreach { r =>
      assert(r.getAs[Long]("repeat_pairs") == viaGroups(r.getAs[Long]("doc_id")))
    }
  }

  test("cluster sample: k per cell, members drawn from that cell, partitioning-invariant") {
    val cells = Similarity.semDedup(embs).select("vec_id", "cell").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val a = Similarity.clusterSample(embs, k = 7).collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("rk"), r.getAs[Long]("vec_id")))
    assert(a.nonEmpty)
    // every sampled member really is assigned to the cell it represents
    a.foreach { case (cell, _, id) => assert(cells(id) == cell) }
    // ≤ k per cell, ranks dense from 1
    a.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 7)
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length))
    }
    // pure key function: same sample at any input partitioning
    val b = Similarity.clusterSample(embs.repartition(13), k = 7).collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Long]("rk"), r.getAs[Long]("vec_id")))
    assert(a.sorted.toSeq == b.sorted.toSeq)
  }

  test("knn label vote: majority of brute-force neighbor labels, tie → lowest label") {
    val labels = embs.select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val nb = Similarity.annBrute(embs, probeMax = 20, k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val out = Similarity.knnClassify(embs, probeMax = 20, k = 5).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Int]("true_label"), r.getAs[Int]("predicted"),
          r.getAs[Long]("votes")))).toMap
    assert(out.size == 20)
    nb.groupBy(_._1).foreach { case (q, ns) =>
      val counts = ns.map(n => labels(n._2)).groupBy(identity)
        .map { case (l, xs) => (l, xs.length) }
      val (wantLabel, wantVotes) =
        counts.toSeq.sortBy { case (l, c) => (-c, l) }.head
      assert(out(q) == ((labels(q), wantLabel, wantVotes.toLong)),
        s"query $q: got ${out(q)}, want ($wantLabel, $wantVotes)")
    }
  }

  test("weighted sample: max source keeps everything, counts bounded, deterministic") {
    val out = TextStats.weightedSample(docs).collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
        r.getAs[Double]("rel_weight"), r.getAs[Double]("expected")))
    assert(out.nonEmpty)
    out.foreach { case (_, n, k, w, e) =>
      assert(k >= 0 && k <= n)
      assert(w > 0.0 && w <= 1.0)
      assert(e == n * w)
    }
    // the largest source has rel_weight exactly 1.0 → every u < 1.0 keeps
    val top = out.filter(_._4 == 1.0)
    assert(top.nonEmpty && top.forall(r => r._3 == r._2))
    // invariant to input partitioning (pure key function)
    val again = TextStats.weightedSample(
      Tables.documents(spark, sf()).repartition(17)).collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("n_kept"))).toMap
    assert(out.forall(r => again(r._1) == r._3))
  }

  test("kmv sketch: within theory error when n >> k, exact path when n < k") {
    import spark.implicits._
    // one source with a known large gram cardinality: w0..w599 in a line
    // gives 598 distinct trigrams per doc block; ten shifted blocks ≈ 5980
    val big = (0 until 10).map { b =>
      (b.toLong, (0 until 600).map(i => s"w${b * 600 + i}").mkString(" "), "big")
    }
    // and one tiny source whose distinct grams stay under k
    val small = Seq((100L, "x0 x1 x2 x3 x4 x5", "small"))
    val df = (big ++ small).toDF("doc_id", "text", "source")
    val out = TextStats.kmvDistinct(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (nBig, estBig) = out("big")
    assert(nBig > 1000, s"test corpus too small: $nBig")
    // KMV relative error is ~1/sqrt(k); allow 5 sigma (k=256 → ±31%)
    assert(math.abs(estBig - nBig) <= 5.0 / math.sqrt(256) * nBig,
      s"estimate $estBig vs exact $nBig out of theoretical range")
    val (nSmall, estSmall) = out("small")
    assert(nSmall == 4 && estSmall == 4.0,
      s"sub-k source must take the exact path, got ($nSmall, $estSmall)")
    // partitioning invariance: pure function of the data
    val again = TextStats.kmvDistinct(df.repartition(13)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(again("big") == estBig)
  }

  test("kmv set ops: sketch estimates track engineered overlap, exact path under k") {
    import spark.implicits._
    // two big sources sharing exactly half their trigram space: the first
    // 5 blocks of b_big repeat a_big's text verbatim, the rest is disjoint
    val aBig = (0 until 10).map { b =>
      (b.toLong, (0 until 600).map(i => s"w${b * 600 + i}").mkString(" "), "a_big")
    }
    val bBig = (0 until 10).map { b =>
      val words =
        if (b < 5) (0 until 600).map(i => s"w${b * 600 + i}")
        else (0 until 600).map(i => s"v${b * 600 + i}")
      (100L + b, words.mkString(" "), "b_big")
    }
    // two tiny sources under k: exact-path algebra must be EXACT
    val tiny = Seq(
      (200L, "x0 x1 x2 x3 x4", "y_s1"),
      (201L, "x2 x3 x4 x5 x6", "z_s2"))
    val df = (aBig ++ bBig ++ tiny).toDF("doc_id", "text", "source")
    val out = TextStats.kmvSetOps(df, exactAudit = true).collect().map { r =>
      (r.getString(0), r.getString(1)) -> r
    }.toMap
    // the DEFAULT plan is sketch-only (no full-domain self-join, no audit
    // column) and its sketch columns match the audited run exactly
    val dflt = TextStats.kmvSetOps(df)
    assert(!dflt.columns.contains("n_exact_inter"),
      "default kmvSetOps still carries the exact-audit column")
    val dfltRows = dflt.collect().map { r =>
      (r.getString(0), r.getString(1)) -> r.getAs[Double]("kmv_inter_est")
    }.toMap
    assert(dfltRows.keySet == out.keySet &&
      dfltRows.forall { case (k, v) => out(k).getAs[Double]("kmv_inter_est") == v },
      "sketch columns diverge between audited and default plans")
    val bigPair = out(("a_big", "b_big"))
    val nInter = bigPair.getAs[Long]("n_exact_inter")
    assert(nInter == 5 * 598, s"engineered intersection off: $nInter")
    val nUnion = 2 * 10 * 598 - nInter // each source: 10 blocks x 598 grams
    val exactJacc = nInter.toDouble / nUnion
    val unionEst = bigPair.getAs[Double]("kmv_union_est")
    val jaccEst = bigPair.getAs[Double]("kmv_jacc_est")
    val interEst = bigPair.getAs[Double]("kmv_inter_est")
    // KMV union error ~1/sqrt(k); jaccard is a k-sample binomial — 5 sigma
    assert(math.abs(unionEst - nUnion) <= 5.0 / math.sqrt(256) * nUnion,
      s"union est $unionEst vs exact $nUnion")
    assert(math.abs(jaccEst - exactJacc) <= 5.0 * math.sqrt(exactJacc / 256),
      s"jaccard est $jaccEst vs exact $exactJacc")
    assert(math.abs(interEst - nInter) <= 0.5 * nInter,
      s"intersection est $interEst vs exact $nInter")
    // tiny pair: merged minima complete -> every estimate collapses to exact
    val tinyPair = out(("y_s1", "z_s2"))
    assert(tinyPair.getAs[Long]("k_used") == 5) // |union| of 3+3 trigrams
    assert(tinyPair.getAs[Long]("shared_minima") == 1)
    assert(tinyPair.getAs[Double]("kmv_union_est") == 5.0)
    assert(tinyPair.getAs[Double]("kmv_inter_est") ==
      tinyPair.getAs[Long]("n_exact_inter").toDouble)
    // disjoint cross pair carries zero shared mass
    val cross = out(("a_big", "y_s1"))
    assert(cross.getAs[Long]("n_exact_inter") == 0 &&
      cross.getAs[Double]("kmv_jacc_est") == 0.0)
    // partitioning invariance: pure function of the data
    val again = TextStats.kmvSetOps(df.repartition(13), exactAudit = true)
      .collect().map { r =>
        (r.getString(0), r.getString(1)) -> r.getAs[Double]("kmv_inter_est")
      }.toMap
    assert(again(("a_big", "b_big")) == interEst)
  }

  test("kmv delta/merge: any batch split and merge order lands on the one-shot sketch") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (i.toLong, (0 until 30).map(j => s"t${(i * 7 + j) % 90}").mkString(" "),
        s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    def snap(st: org.apache.spark.sql.DataFrame) =
      st.orderBy("source", "h").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
    val k = 16 // small k so merges actually truncate
    val oneShot = TextStats.kmvDelta(docs, k)
    for (parts <- Seq(2, 4)) {
      val deltas = (0 until parts).map(i =>
        TextStats.kmvDelta(docs.filter(col("doc_id") % parts === i), k))
      val ltr = deltas.reduceLeft(TextStats.kmvMerge(_, _, k))
      val rtl = deltas.reduceRight(TextStats.kmvMerge(_, _, k))
      assert(snap(ltr) == snap(oneShot), s"$parts-way LTR diverged")
      assert(snap(rtl) == snap(oneShot), s"$parts-way RTL diverged")
      // the estimate read off the merged state matches the one-shot read
      // (kmvEstimate promises no row order — the registered gates sort;
      // compare per-source)
      def est(st: org.apache.spark.sql.DataFrame) =
        TextStats.kmvEstimate(st, k).orderBy("source")
          .collect().map(_.toSeq).toSeq
      assert(est(ltr) == est(oneShot))
    }
  }

  test("bloom delta/merge: split-invariant, idempotent under replay, audit matches one-shot") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (i.toLong, s"doc body ${i % 25} tail", s"src${i % 3}")
    }.toDF("doc_id", "text", "source")
    def snap(st: org.apache.spark.sql.DataFrame) =
      st.orderBy("pos").collect().map(_.getLong(0)).toSeq
    val oneShot = TextStats.bloomDelta(docs)
    for (parts <- Seq(2, 4)) {
      val deltas = (0 until parts).map(i =>
        TextStats.bloomDelta(docs.filter(col("doc_id") % parts === i)))
      val merged = deltas.reduceLeft(TextStats.bloomMerge)
      assert(snap(merged) == snap(oneShot), s"$parts-way split diverged")
      // idempotence: re-applying a delta (at-least-once replay) is a no-op
      assert(snap(TextStats.bloomMerge(merged, deltas.head)) == snap(oneShot))
    }
    // the audit off maintained state is the one-shot audit
    assert(TextStats.bloomAuditFromState(oneShot, docs).collect().map(_.toSeq).toSeq
      == TextStats.bloomAudit(docs).collect().map(_.toSeq).toSeq)
  }

  test("count-min: one-sided error, exact for unique cells, partitioning-invariant") {
    import spark.implicits._
    // a corpus with a known frequency profile: token fN appears N times
    val docs = (1 to 30).map { n =>
      (n.toLong, Seq.fill(n)(s"f$n").mkString(" "), "src")
    }.toDF("doc_id", "text", "source")
    val out = TextStats.countMinTokens(docs).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (exact, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_est"))
      assert(est >= exact, s"count-min must never undercount: $r")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
    // top-20 of f30..f11 by construction (count desc)
    assert(out.head.getAs[String]("token") == "f30" &&
      out.head.getAs[Long]("n_exact") == 30)
    // 465 occurrences into 4x1024 cells: collisions are rare; the min
    // over 4 independent rows must recover most counts exactly
    assert(out.count(r => r.getAs[Long]("overcount") == 0L) >= 15)
    val again = TextStats.countMinTokens(docs.repartition(7)).collect()
    assert(again.map(r => (r.getString(0), r.getLong(2))).toSeq ==
      out.map(r => (r.getString(0), r.getLong(2))).toSeq)
  }

  test("bloom audit: zero false negatives, bounded false positives") {
    import spark.implicits._
    val docs = (0 until 400).map { i =>
      (i.toLong, s"unique document body number $i with filler", "src")
    }.toDF("doc_id", "text", "source")
    val out = TextStats.bloomAudit(docs).collect().map { r =>
      (r.getAs[Long]("doc_id"), r.getAs[Boolean]("bloom_hit"),
        r.getAs[Boolean]("is_member"))
    }
    assert(out.length == 400)
    // the bloom contract: a member NEVER misses
    assert(out.forall { case (_, hit, member) => !member || hit },
      "false negative — bloom contract broken")
    // even doc_ids are the indexed half
    assert(out.forall { case (id, _, member) => member == (id % 2 == 0) })
    // 200 members x 3 hashes in 4096 bits -> fill ~14%; fp rate ~0.3%.
    // Allow a generous margin — but 200 non-members must not all hit.
    val fps = out.count { case (_, hit, member) => hit && !member }
    assert(fps <= 10, s"false-positive rate implausibly high: $fps/200")
  }

  test("pq: codes in range, codebook non-degenerate, partitioning-invariant") {
    val out = Similarity.pqQuantize(embs).collect()
    assert(out.length > 0)
    val codes = out.map(r => (0 until Similarity.PqM).map(m => r.getInt(1 + m)))
    assert(codes.flatten.forall(c => c >= 0 && c < Similarity.PqK))
    // a trained codebook spreads vectors over many codes per subspace
    (0 until Similarity.PqM).foreach { m =>
      val used = codes.map(_(m)).distinct.length
      assert(used > Similarity.PqK / 2, s"subspace $m uses only $used codes")
    }
    assert(out.forall(r => r.getDouble(1 + Similarity.PqM) >= 0.0))
    // pure function of the data: invariant to input partitioning
    val again = Similarity.pqQuantize(embs.repartition(7)).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("pq ADC search: valid ranks, no self-match, decent recall vs float brute force") {
    val adc = Similarity.annPq(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(adc.nonEmpty)
    assert(adc.forall { case (q, _, n) => q != n })
    val byQ = adc.groupBy(_._1)
    assert(byQ.values.forall(_.map(_._2).sorted.toSeq == (1 to 5)))
    // ADC ranks L2 distances to the QUANTIZED corpus vectors: measure
    // recall against the float-exact L2 top-5 (the same metric — cosine
    // brute force would conflate metric mismatch with codebook loss)
    val vecs = embs.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val recall = byQ.map { case (q, rows) =>
      val qa = vecs(q)
      val exact = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (l2(qa, v), id) }.sorted.take(5).map(_._2).toSet
      rows.count(r => exact.contains(r._3)).toDouble / 5.0
    }
    val mean = recall.sum / recall.size
    // The testdata embeddings are iid-random: pairwise distances
    // concentrate, so ANY 2-bit/dim quantizer scrambles much of the
    // top-5 (a parameter sweep measured 0.19 @ 4x16 up to only 0.49 @
    // 16x64 codebooks — structural, not a bug; real embeddings cluster
    // and PQ recall rides that structure). Pin well above the random
    // baseline (5/499 ≈ 0.01) so a broken codebook still fails loudly.
    assert(mean >= 0.12, s"mean recall@5 vs exact L2 too low: $mean")
  }

  test("ivfpq ADC search: valid ranks, no self-match, invariant to input partitioning") {
    val out = Similarity.annIvfPq(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.forall { case (q, _, n) => q != n })
    val byQ = out.groupBy(_._1)
    assert(byQ.size == 20, s"every probe must find candidates: ${byQ.size}")
    assert(byQ.values.forall(_.map(_._2).sorted.toSeq == (1 to 5)))
    // pure function of the data (training sample is vec_id-bounded, the
    // two-phase tournament is order-free): partitioning cannot move it
    val again = Similarity.annIvfPq(embs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("containment: verbatim quote scores 1.0 with low jaccard; df cap kills boilerplate pairs") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon zeta"
    val long = ("intro words here " + quote + " " +
      (0 until 80).map(i => s"filler$i").mkString(" ")).trim
    // 70 docs sharing ONE common trigram (df 70 > cap 64): must not pair
    val boiler = (10L until 80L).map(i =>
      (i, s"common gram here unique$i tail$i bit$i"))
    val df = (Seq((1L, quote), (2L, long)) ++ boiler).toDF("doc_id", "text")
    val out = TextDedup.containmentPairs(df).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // the quote is wholly inside the long doc
    val (contA, contB, jacc) = out((1L, 2L))
    assert(contA == 1.0, s"quote containment must be exact 1.0, got $contA")
    assert(contB < 0.1 && jacc < 0.1,
      s"asymmetric pair must have low reverse containment/jaccard: $contB, $jacc")
    // no pair among the boilerplate docs: their only shared gram is capped
    assert(out.keys.forall { case (a, b) => a == 1L && b == 2L },
      s"df cap failed, got pairs: ${out.keys}")
  }

  test("bpe: learns the textbook merges on the Sennrich corpus") {
    import spark.implicits._
    // word frequencies low:5 lower:2 newest:6 widest:3 — the worked
    // example from the BPE paper; merges are hand-computable:
    // (e,s):9 → (es,t):9 → (l,o):7 → (lo,w):7
    val df = Seq(
      (1L, List.fill(5)("low").mkString(" ")),
      (2L, List.fill(2)("lower").mkString(" ")),
      (3L, List.fill(6)("newest").mkString(" ")),
      (4L, List.fill(3)("widest").mkString(" "))).toDF("doc_id", "text")
    val out = Bpe.bpeMerges(df, k = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L)), out.mkString(", "))
  }

  test("bpe encode: hand-computed token counts on the Sennrich corpus") {
    import spark.implicits._
    // after the 4 merges (es, est, lo, low):
    // low → [low] = 1 token; lower → [low,e,r] = 3; newest → [n,e,w,est]
    // = 4; widest → [w,i,d,est] = 4
    val df = Seq(
      (1L, List.fill(5)("low").mkString(" ")),
      (2L, List.fill(2)("lower").mkString(" ")),
      (3L, List.fill(6)("newest").mkString(" ")),
      (4L, List.fill(3)("widest").mkString(" ")),
      (5L, "")).toDF("doc_id", "text")
    val out = Bpe.bpeEncode(df, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 5L, 5L * 1), (2L, 2L, 2L * 3), (3L, 6L, 6L * 4),
      (4L, 3L, 3L * 4), (5L, 0L, 0L)), out.mkString(", "))
  }

  test("bpe: stops early when the corpus exhausts before k merges") {
    import spark.implicits._
    // 'ab' fully merges in one round; round 2 has no adjacent pairs left
    val df = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val out = Bpe.bpeMerges(df, k = 4).collect()
    assert(out.length == 1)
    assert(out(0).getString(3) == "ab" && out(0).getLong(4) == 2L)
  }

  test("hard negatives: every neighbor crosses the label boundary, ranks dense") {
    val probeLabels = embs.filter(col("vec_id") < 20)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val out = Similarity.hardNegatives(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(out.nonEmpty)
    // the mined negative must differ in label from its probe — that IS
    // the operator's contract (self-exclusion falls out for free)
    assert(out.forall { case (q, _, _, nl) => probeLabels(q) != nl })
    val byQ = out.groupBy(_._1)
    assert(byQ.values.forall(_.map(_._2).sorted.toSeq == (1 to 5)))
  }

  test("media fingerprint near-dup: bands catch every pair within hamming 3, none beyond") {
    import spark.implicits._
    // hand-built 60-bit fingerprints: the sha gate only ever produces
    // hamming-0/planted-1 pairs, so the interesting radii are pinned here
    val base = 0x0123456789ABCDL
    val fps = Seq(
      (1L, base),                                  // reference
      (2L, base),                                  // exact dup (hamming 0)
      (3L, base ^ (1L << 59)),                     // 1 bit, top band
      (4L, base ^ (1L << 0) ^ (1L << 15) ^ (1L << 30)), // 3 bits across 3 bands
      (5L, base ^ 0xFL),                           // 4 bits: beyond radius
      (6L, ~base & 0xFFFFFFFFFFFFFFFL)             // far
    ).toDF("asset_id", "fp")
    val got = Multimodal.fingerprintNearDup(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // (3,4) is hamming 4, (5,*) ≥ 4, (6,*) far — none may appear; the
    // exact-dup collapse must still expand (2,3)/(2,4) via 2's rep 1
    assert(got === Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1),
      (1L, 4L, 3), (2L, 4L, 3)))
  }

  test("nfc_normalize: composes decomposed forms, passes ASCII through, codegen path") {
    import spark.implicits._
    import graft.functions.NfcNormalize
    val df = Seq(
      ("plain ascii", "plain ascii"),
      ("caf\u00e9", "caf\u00e9"),       // already composed: unchanged
      ("cafe\u0301", "caf\u00e9"),      // e + combining acute composes
      ("A\u030angstro\u0308m", "\u00c5ngstr\u00f6m")) // A-ring and o-umlaut compose
      .toDF("raw", "want")
    val bad = df.filter(NfcNormalize(col("raw")) =!= col("want")).count()
    assert(bad == 0)
    // canonical dedup groups a composed/decomposed pair
    val docs = Seq((1L, "the caf\u00e9 menu"), (2L, "the cafe\u0301 menu"),
      (3L, "unrelated")).toDF("doc_id", "text")
    val got = graft.llm.TextDedup.canonDedup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 1L, 2L), (2L, 1L, 2L)))
  }
}
