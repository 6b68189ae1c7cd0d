package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Three tiers, all designed to never materialize the all-pairs product:
  *
  *  - [[exactDedup]]     — hash-groupBy on a normalized fingerprint; one
  *                         shuffle on the fingerprint, linear in N.
  *  - [[minhashNearDup]] — shingle → MinHash signature → banded LSH: docs
  *                         shuffle on (band, band_hash), only same-bucket
  *                         pairs are generated and then verified with exact
  *                         Jaccard. Miss probability for a pair at Jaccard
  *                         s is (1 - s^R)^B — with R=4, B=32 a 0.9-similar
  *                         pair is missed with p ≈ 1.5e-15.
  *  - [[simhashNearDup]] — 32-bit SimHash fingerprint + pigeonhole banding:
  *                         pairs within Hamming distance d must share one of
  *                         (d+1) exact bands, so candidates come from an
  *                         equi-join on band value, never a cross join.
  *
  * At 100 TB the heaviest stage is the band-bucket shuffle, which is
  * O(N · bands) rows of (id, hash) — small fixed-width records — and the
  * verify joins are equi-joins keyed by doc id. Skewed buckets are
  * bounded two ways: AQE skew-join splitting for shuffle balance, and the
  * [[MinhashBucketCap]] guard for pair-count blow-up (a viral boilerplate
  * string would otherwise generate n² candidate pairs from one bucket).
  */
object TextDedup {

  /** Cache lifecycle: several operators here persist an intermediate frame
    * (MEMORY_AND_DISK) that the returned plan reads more than once — the
    * chunked corpus, the gram-set scan, the posting lists. The persist is
    * part of the returned plan's lineage, so it cannot be dropped before
    * the caller's action runs: CALLERS own the cache lifecycle — after
    * materializing the result, `spark.catalog.clearCache()` (what Bench
    * does between queries) or unpersist via the frame's own reference in a
    * long-lived session. Internal-only caches whose lifetime ends inside a
    * function (labelPropagation's per-round edges) are unpersisted here. */

  /** Word-trigram shingle set, matching the oracle's self-join construction:
    * shingle_i = w(i) + " " + w(i+1) + " " + w(i+2), 1-based, distinct.
    * Documents with fewer than 3 tokens have no shingles (and so can never
    * pair — same as the oracle). */
  def shingled(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("shingles",
        when(size(col("w")) >= 3, expr(
          """array_distinct(transform(sequence(1, size(w) - 2),
            |  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))""".stripMargin))
          .otherwise(expr("array()")))
      .drop("w")

  /** Bag-of-words normalization fingerprint: md5 of the sorted distinct
    * token set. ONE definition shared by [[exactDedup]] and
    * [[exactDedupAgainst]] — a normalization change must reach both, or
    * corpus fingerprints written under one version stop matching the
    * incoming batch's. (The c1 curation oracle mirrors this expression.) */
  def bagOfWordsFingerprint(text: Column): Column =
    bagOfWordsFingerprintFromTokens(split(text, " "))

  /** Token-array form, for callers that already split (c1 curation). */
  def bagOfWordsFingerprintFromTokens(tokens: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens))))

  /** Exact-dedup KEEP POLICY: per duplicate group, keep the longest copy
    * (raw token count; doc_id breaks ties low) — the RefinedWeb-style
    * upgrade over [[exactDedup]]'s keep-min-id: bag-of-words duplicates
    * differ in raw length, and the longest usually carries the least
    * truncation. The argmax is a partial-aggregable `max(struct(n_tok,
    * -doc_id))` — lexicographic struct max in BOTH engines — so an
    * adversarial million-copy group map-side-combines instead of
    * funneling through one window task. Output per duplicate group:
    * (fingerprint, n_copies, keep_n_tok, keep_id, n_tok_dropped). */
  def dedupKeepLongest(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tok"),
        bagOfWordsFingerprintFromTokens(col("w")).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_copies"),
        max(struct(col("n_tok").as("nt"), (-col("doc_id")).as("nid"))).as("st"),
        sum("n_tok").as("tot_tok"))
      .filter(col("n_copies") > 1)
      .select(col("fingerprint"), col("n_copies"),
        col("st.nt").as("keep_n_tok"), (-col("st.nid")).as("keep_id"),
        (col("tot_tok") - col("st.nt")).as("n_tok_dropped"))
      .orderBy("fingerprint")

  /** Exact dedup after bag-of-words normalization: fingerprint = md5 of the
    * sorted distinct token set. Returns one row per duplicate group with the
    * kept (minimum) doc_id and the copy count. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("fingerprint", bagOfWordsFingerprint(col("text")))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select("fingerprint", "keep_id", "n_copies")
      .orderBy("keep_id")

  // MinHash: K signature slots, banded R rows × B bands (K = R * B).
  val MinhashK = 128
  val MinhashR = 4
  val MinhashB = 32

  /** Hot-bucket guard: a band bucket holding more than this many docs is
    * dropped from candidate generation (r2 VERDICT #6 — AQE splits a
    * skewed bucket's *shuffle* but nothing bounds its *pair count*, which
    * grows as n², the viral-boilerplate pathology). A dropped bucket's
    * members are near-identical en masse — exactly what [[exactDedup]]
    * (or any one of their OTHER band buckets, if genuinely under the cap)
    * already catches; the cap is far above any organic bucket size, so it
    * only fires on pathological mass duplication. 256 docs ⇒ ≤ 32 640
    * pairs per bucket, a hard ceiling per (band, hash). */
  val MinhashBucketCap = 256

  /** Near-duplicate pairs by banded-MinHash LSH, verified with exact
    * word-trigram Jaccard >= `threshold`. Output: (doc_a, doc_b, jaccard),
    * doc_a < doc_b, sorted.
    *
    * Scale shape: the text is read ONCE — each doc collapses to its set of
    * 64-bit shingle hashes (8 B per shingle, ~2 orders smaller than the
    * text), persisted MEMORY_AND_DISK and reused by the signature, banding
    * and verification stages. Jaccard over the hash sets equals string
    * Jaccard absent 64-bit collisions (~|A||B|/2^64 per pair). The band
    * self-join is aliased over one plan so the band-bucket shuffle is
    * written once and ReusedExchange reads it back for the other side. */
  def minhashNearDup(docs: DataFrame, threshold: Double = 0.8): DataFrame =
    // trigram_hashes replaces shingle-string construction + re-hashing
    // (three-way concat per window) with direct hash chaining in one
    // codegen'd kernel; the distinct-hash set preserves shingle equality,
    // which is all Jaccard needs
    lshVerifiedPairs(
      docs.select(col("doc_id"),
        graft.functions.TrigramHashes(split(col("text"), " ")).as("hset")),
      threshold)

  /** Band-vote floor for the char-gram path. Character grams are far less
    * selective than word shingles — unrelated English documents share
    * ~18 % of their 5-grams (common letter sequences), giving each of the
    * 32 bands a ~0.1 % match probability, which at a single-band floor
    * made 3.5 % of ALL pairs candidates (measured: 443 k candidate pairs
    * at sf0.1 — the verify stage, not the data, became the cost). With a
    * ≥ 3-band vote, a random pair qualifies with p ≈ 6e-6 while a pair at
    * the 0.7 threshold (per-band p = 0.24, mean 7.7 of 32 bands) is
    * missed with p ≈ 0.9 % — and pairs at the similarity our verify
    * actually confirms (≥ 0.9) are missed with p ≈ 1e-12. */
  val NgramMinBandMatches = 3

  /** Character n-gram Jaccard near-duplicates (default 5-grams, Jaccard >=
    * 0.7) — the n-gram-Jaccard dedup family: catches near-dups that
    * word-level shingles under-weigh (intra-word edits, punctuation/
    * whitespace variance), with the SAME banded-LSH scale shape as
    * [[minhashNearDup]] — never all-pairs. Grams are hashed to 64 bits at
    * the scan (codegen'd rolling hash); Jaccard over the hash sets equals
    * string Jaccard absent collisions (~|A||B|/2^64 per pair, the l2
    * argument). Output: (doc_a, doc_b, jaccard), doc_a < doc_b, sorted. */
  def ngramJaccardNearDup(docs: DataFrame, n: Int = 5, threshold: Double = 0.7): DataFrame =
    lshVerifiedPairs(
      docs.select(col("doc_id"),
        graft.functions.CharNgramHashes(col("text"), n).as("hset")),
      threshold, minBandMatches = NgramMinBandMatches)

  /** The shared near-dup engine: banded-MinHash candidate generation +
    * exact-Jaccard verification over a `(doc_id, hset ARRAY<LONG>)` frame.
    * The hash sets are computed ONCE (persisted MEMORY_AND_DISK — 8 B per
    * gram, orders smaller than text); EXACT-duplicate sets are collapsed
    * to one representative before any LSH work — web-scale corpora are
    * duplicate-heavy, and without the collapse every group of d copies
    * multiplies candidate generation AND exact verification by d²
    * (measured 2–4× of those queries' wall time on the 10×-replicated
    * scale bench). Signature, banding and verify run once per unique set;
    * member pairs are expanded back afterward — identical output, since
    * Jaccard is a function of the sets alone: cross pairs inherit the
    * verified value, intra-group pairs are exactly 1.0. Intra expansion
    * of groups larger than [[MinhashBucketCap]] is suppressed (the same
    * mass-duplication principle as the bucket guard: that pathology is
    * [[exactDedup]]'s job, not a pair list).
    *
    * `minBandMatches` > 1 turns candidate generation into a band VOTE — a
    * pair must collide in that many bands before the exact verify sees it
    * (needed when the gram family is weakly selective, see
    * [[NgramMinBandMatches]]); the count rides on the aggregation that
    * replaces the candidate `distinct`, so it costs nothing extra. */
  private def lshVerifiedPairs(
      hashSets: DataFrame, threshold: Double, minBandMatches: Int = 1): DataFrame = {
    val (withRep, vpairs) = lshRepPairs(hashSets, threshold, minBandMatches)
    expandMemberPairs(withRep, vpairs)
  }

  /** The collapse + LSH + verify stages of [[lshVerifiedPairs]], stopped
    * at REPRESENTATIVE granularity: returns (the cached hset-collapsed
    * frame `(doc_id, hset, rep, grp_n)`, the verified unique-set pairs
    * `(doc_a, doc_b, jaccard)` over representatives only). Callers that
    * need a member-level pair LIST expand via [[expandMemberPairs]];
    * callers that only need member-level COMPONENTS ([[minhashClusters]])
    * must NOT — the expansion is the pair family's one term quadratic in
    * replica depth (a verified rep pair between groups of d₁ and d₂
    * copies is d₁·d₂ member rows), and components re-collapse it
    * immediately. */
  private def lshRepPairs(
      hashSets: DataFrame, threshold: Double, minBandMatches: Int): (DataFrame, DataFrame) = {
    // one linear shuffle, keyed by the gram-set itself — unconditional
    // set equality, no hash-collision caveat. Windows (not
    // groupBy+collect_list) keep the member mapping FLAT: a group is
    // never materialized as one row's array, so even a viral page with
    // millions of copies can't blow up a single task
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("hset")
    val withRep = hashSets
      .withColumn("rep", min("doc_id").over(wg))
      .withColumn("grp_n", count(lit(1)).over(wg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hs = withRep.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("hset"))

    // signature: one custom codegen'd Expression computes all K slots in a
    // primitive loop per row (see graft.functions.MinHashSig for why it
    // beats both the explode + K-min-agg shape — a shuffle plus a K-wide
    // codegen compile — and the interpreted higher-order forms). Zero
    // shuffle before banding.
    val sig = hs.select(col("doc_id"),
      graft.functions.MinHashSig(col("hset"), MinhashK).as("sig"))

    // banding: B buckets keyed by (band index, hash of the R-slot slice) —
    // one codegen'd kernel + posexplode (see BandHashes for why not a
    // transform/named_struct tree)
    val rawBands = sig
      .select(col("doc_id"),
        posexplode(graft.functions.BandHashes(col("sig"), MinhashB, MinhashR)))
      .toDF("doc_id", "band_idx", "band_hash")

    // hot-bucket guard: count per bucket with a window over the SAME
    // (band_idx, band_hash) key the self-join shuffles on — the exchange
    // is shared, so the guard costs no extra shuffle — and drop buckets
    // over the cap before any pair is formed
    val bands = rawBands
      .withColumn("bucket_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_hash")))
      .filter(col("bucket_n") <= MinhashBucketCap)
      .drop("bucket_n")

    val candidates = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("_nb"))
      .filter(col("_nb") >= minBandMatches)
      .drop("_nb")

    // exact verification on the candidate set only, over the cached hash
    // sets — once per unique-set pair
    val a = hs.select(col("doc_id").as("doc_a"), col("hset").as("sa"))
    val b = hs.select(col("doc_id").as("doc_b"), col("hset").as("sb"))
    val vpairs = candidates
      .join(a, "doc_a")
      .join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("inter") * lit(1.0) / (size(col("sa")) + size(col("sb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
    (withRep, vpairs)
  }

  /** Expand [[lshRepPairs]]' representative pairs back to the member-level
    * pair list (the lshVerifiedPairs output contract). */
  private def expandMemberPairs(withRep: DataFrame, vpairs: DataFrame): DataFrame = {
    // expand representative pairs back to member pairs (groups are
    // disjoint, so least/greatest just restores doc_a < doc_b) ...
    val ma = withRep.select(col("rep").as("doc_a"), col("doc_id").as("m_a"))
    val mb = withRep.select(col("rep").as("doc_b"), col("doc_id").as("m_b"))
    val cross = vpairs
      .join(ma, "doc_a").join(mb, "doc_b")
      .select(least(col("m_a"), col("m_b")).as("doc_a"),
        greatest(col("m_a"), col("m_b")).as("doc_b"), col("jaccard"))
    // ... plus intra-group pairs: identical nonempty sets are Jaccard
    // exactly 1.0 (two EMPTY sets share no gram — never a pair, exactly
    // as the oracle's join computes); capped per the doc above. Aliased
    // self-join on the same frame → one exchange, ReusedExchange reads it
    // back for the other side
    val im = withRep
      .filter(col("grp_n").between(2, MinhashBucketCap) && size(col("hset")) > 0)
      .select(col("rep"), col("doc_id"))
    val intra = im.as("x")
      .join(im.as("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(1.0).as("jaccard"))

    cross.unionByName(intra).orderBy("doc_a", "doc_b")
  }

  /** Incremental exact dedup: keep only the `incoming` documents whose
    * normalized fingerprint ([[exactDedup]]'s bag-of-words md5) appears
    * neither in the existing `corpus` nor earlier (lower doc_id) in the
    * incoming batch itself — the "dedup the new crawl against what we
    * already have" primitive, which must NOT re-scan-pair the corpus.
    * Output: kept (doc_id, fingerprint), sorted.
    *
    * Scale shape — the corpus NEVER shuffles: a crawl batch is small
    * relative to the standing corpus (GBs vs 100 TB), so its distinct
    * fingerprint set broadcasts. Pass 1 semi-joins the corpus scan
    * against that broadcast — corpus rows stream through map-side, and
    * only the matched fingerprints (≤ the batch's own fingerprint
    * count) survive to a small distinct. Pass 2 broadcast-anti-joins
    * those hits back onto the batch. The alternative — anti-joining the
    * batch against ALL corpus fingerprints — shuffles fingerprint-width
    * rows for every corpus document ever crawled, per batch; this shape
    * shuffles only batch-sized frames no matter how large the corpus
    * grows. (If a batch ever outgrows broadcast, fall back to a bucketed
    * corpus-fingerprint table and a co-located anti-join.) Intra-batch
    * dedup is a min-per-fingerprint aggregate. The corpus text is never
    * re-paired, only its fingerprints. */
  def exactDedupAgainst(corpus: DataFrame, incoming: DataFrame): DataFrame = {
    def fp(df: DataFrame) = df.select(col("doc_id"),
      bagOfWordsFingerprint(col("text")).as("fingerprint"))
    val inc = fp(incoming)
    val dupFps = fp(corpus).select("fingerprint")
      .join(broadcast(inc.select("fingerprint").distinct()),
        Seq("fingerprint"), "left_semi")
      .distinct()
    inc.join(broadcast(dupFps), Seq("fingerprint"), "left_anti")
      .groupBy("fingerprint").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "fingerprint")
      .orderBy("doc_id")
  }

  /** Streaming face of exact dedup — for CONTINUOUS crawl ingestion: each
    * micro-batch's documents are admitted only if their normalized
    * fingerprint ([[bagOfWordsFingerprint]] — the same definition as the
    * batch and incremental paths, so all three faces agree on what "a
    * duplicate" is) was not already admitted within the watermark
    * horizon. State is keyed by the 16-byte fingerprint, bounded by the
    * watermark (Spark evicts keys older than `horizon` — without the
    * bound, dedup state on an endless crawl grows forever). The horizon
    * is therefore the dedup window; history OLDER than it is the
    * standing corpus's job — run [[exactDedupAgainst]] against the
    * compacted corpus downstream (the lambda-architecture split every
    * streaming dedup deployment uses). */
  def dedupStream(
      docs: DataFrame,
      tsCol: String = "ts",
      horizon: String = "10 minutes"): DataFrame =
    // State grows with distinct fingerprints inside the watermark
    // horizon — unbounded for a continuous crawl. The default
    // HDFSBackedStateStoreProvider keeps every key on-heap and
    // re-snapshots per batch; at scale run this on the RocksDB provider
    // (spark.sql.streaming.stateStore.providerClass =
    // ...state.RocksDBStateStoreProvider): spillable, incremental
    // changelog, measured 2.4x faster on the sf1 gate with identical
    // results (StreamingSpec pins the parity).
    docs
      .withColumn("fingerprint", bagOfWordsFingerprint(col("text")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Decontamination n-gram length — the standard pre-training hygiene
    * window (8–13 words; one shared n-gram of this length between a
    * training document and an eval benchmark is taken as contamination). */
  val DecontamN = 8

  /** Benchmark decontamination: flag training documents sharing ANY word
    * [[DecontamN]]-gram with the benchmark set. Output: (doc_id, n_hits)
    * — contaminated training docs with their distinct-overlapping-gram
    * count, sorted.
    *
    * Scale shape: each side collapses to its distinct n-gram *hash* set
    * at the scan (codegen'd [[graft.functions.NGramHashes]] — 8 B per
    * gram; hash equality ≡ string equality absent ~2^-64 collisions, the
    * l2 argument); the benchmark gram set (small — eval suites are MBs,
    * not TBs) is broadcast, so the 100 TB training scan never shuffles:
    * probe, partial-count, done. If the benchmark side ever outgrows a
    * broadcast, removing the hint degrades gracefully to a shuffle-on-
    * gram join. */
  def decontaminate(
      docs: DataFrame, benchmark: DataFrame, n: Int = DecontamN): DataFrame = {
    def grams(df: DataFrame) = df.select(col("doc_id"),
      explode(graft.functions.NGramHashes(split(col("text"), " "), n)).as("g"))
    val bench = grams(benchmark).select("g").distinct()
    grams(docs)
      .join(broadcast(bench), Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      .orderBy("doc_id")
  }

  /** Fingerprints shared by more documents than this are dropped from
    * pair generation — the MOSS "too common to be evidence" filter
    * (boilerplate k-grams every document contains say nothing about any
    * PAIR), doubling as the quadratic guard: one posting list can form at
    * most cap² candidate pairs, so no single viral fingerprint can
    * detonate the self-join. Mirrored verbatim in the oracle. */
  val WinnowHashCap = 64

  /** MOSS-style near-dup via winnowing-fingerprint overlap (Schleimer et
    * al., SIGMOD'03 §4 — the copy-detection use the winnowing paper was
    * written for): two documents are near-duplicates when the shared
    * fraction of their selected fingerprints reaches `minOverlap`,
    * measured against the SMALLER document (containment — so a document
    * pasted inside a bigger one still scores high). Output:
    * (doc_a, doc_b, n_shared, overlap), sorted.
    *
    * Complements the other near-dup families: minhash/n-gram estimate
    * whole-document Jaccard, simhash a global bit profile — fingerprint
    * overlap is LOCAL evidence (each shared hash is a verbatim shared
    * k-gram window), which is what plagiarism/quotation/partial-copy
    * detection needs. Pairing is EXACT given the fingerprint sets (an
    * equi-join on hash values, no probabilistic banding), so the oracle
    * reproduces it with no threshold-gap caveat.
    *
    * Scale shape: one codegen'd [[graft.functions.WinnowFingerprint]]
    * kernel per row collapses each document to ~2/(W+1) of its k-grams
    * (8 B each); the posting-list self-join shuffles only
    * (doc_id, n_fp, hash) rows on the hash key; [[WinnowHashCap]] bounds
    * every posting list ON the join's own shuffle key (window count — no
    * extra exchange, the minhash-bucket pattern); the per-pair aggregate
    * is a partial-combined count. Set sizes ride along on the posting
    * rows, so no size-lookup join afterwards. The filtered posting frame
    * is persisted so the fingerprint kernel and the document-frequency
    * window run ONCE and serve both join sides (without the cache,
    * Catalyst re-derives each side from the scan — and the explode's
    * implicit non-empty filter makes it evaluate the kernel 3x per row;
    * the l12 lesson, pinned in PlanShapeSpec). */
  def winnowOverlapPairs(docs: DataFrame, minOverlap: Double = 0.5): DataFrame = {
    val postings = docs
      .select(col("doc_id"),
        graft.functions.WinnowFingerprint(split(col("text"), " ")).as("fp"))
      .withColumn("n_fp", size(col("fp")))
      .select(col("doc_id"), col("n_fp"), explode(col("fp")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the hot set is small BY CONSTRUCTION (≤ |postings|/cap hashes can
    // exceed the cap), so filter via partial-aggregated count + broadcast
    // anti-join — a window count on the hash key would SORT the whole
    // posting list inside each partition just to count it (measured ~2x
    // the query). A corpus so boilerplate-heavy the hot set outgrows a
    // broadcast degrades gracefully: drop the hint and the anti-join
    // shuffles on the same hash key the pair join uses anyway.
    val hot = postings.groupBy("h")
      .agg(count(lit(1)).as("df")).filter(col("df") > WinnowHashCap)
      .select("h")
    val filtered = postings.join(broadcast(hot), Seq("h"), "left_anti")
    filtered.as("x")
      .join(filtered.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n_fp").as("na"), col("y.n_fp").as("nb"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("overlap",
        col("n_shared") * lit(1.0) / least(col("na"), col("nb")))
      .filter(col("overlap") >= minOverlap)
      .select("doc_a", "doc_b", "n_shared", "overlap")
      .orderBy("doc_a", "doc_b")
  }

  /** Chunk width (in tokens) for [[chunkDedup]] — coarse enough that a
    * shared chunk is strong evidence of copying (a 20-token verbatim
    * overlap is never coincidence), fine enough to localize which parts
    * of a document are duplicated. */
  val ChunkTokens = 20

  /** Cross-document duplicated-chunk detection — the chunk-granularity
    * form of exact-substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better": verbatim repeated
    * passages, not just whole-doc near-dups, drive memorization). Each
    * document is cut into non-overlapping [[ChunkTokens]]-token chunks
    * (tail remainder ignored); a chunk is *duplicated* when the same
    * token sequence appears in more than one distinct document. Output
    * per document: chunk count, duplicated-chunk instances, and the
    * duplicated fraction — the signal a curation pass thresholds on (or
    * uses to cut the offending spans). Suffix-array exact-substring
    * dedup finds unaligned overlaps too; aligned chunks are the
    * shuffle-friendly approximation (one fixed hash per token position
    * instead of O(len) suffixes).
    *
    * Scale shape: each doc collapses to size/20 chunk *hashes* at the
    * scan (hash equality ≡ string equality absent ~2^-64 collisions, the
    * l2 argument); duplicated-chunk lookup is a pair of hash-keyed
    * shuffles (count-distinct-docs per chunk, then an equi-join back),
    * with AQE free to broadcast the duplicated set when it is small —
    * no broadcast is *assumed*, so a duplicate-heavy corpus degrades to
    * a plain shuffle join, never OOM. */
  def chunkDedup(docs: DataFrame, c: Int = ChunkTokens): DataFrame = {
    // chunk kernel runs ONCE: the persisted frame serves the dup-set
    // aggregate, the per-doc dup count, and the final n_chunks column
    // (without it Catalyst re-derives all three from the text scan)
    val withChunks = docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("ch",
        when(size(col("w")) >= c, expr(
          s"""transform(sequence(0, CAST(size(w) / $c AS INT) - 1),
             |  i -> xxhash64(concat_ws(' ', slice(w, i * $c + 1, $c))))""".stripMargin))
          .otherwise(expr("array()")))
      .select(col("doc_id"), col("ch"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunks = withChunks.select(col("doc_id"), explode(col("ch")).as("h"))
    val dupSet = chunks.groupBy("h")
      .agg(countDistinct("doc_id").as("dd"))
      .filter(col("dd") > 1).select("h")
    val perDoc = chunks.join(dupSet, Seq("h"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_chunks"))
    withChunks
      .select(col("doc_id"), size(col("ch")).cast("long").as("n_chunks"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_dup_chunks", coalesce(col("n_dup_chunks"), lit(0L)))
      .withColumn("dup_chunk_frac",
        when(col("n_chunks") === 0, 0.0)
          .otherwise(col("n_dup_chunks") * lit(1.0) / col("n_chunks")))
      .select("doc_id", "n_chunks", "n_dup_chunks", "dup_chunk_frac")
      .orderBy("doc_id")
  }

  /** The REWRITE face of chunk-granularity exact-substring dedup (Lee et
    * al. 2021 actually *removes* the duplicated span, it does not drop the
    * document): every chunk whose token sequence appears in more than one
    * distinct document is cut out, the survivors plus the sub-chunk tail
    * reassemble in order, and the output row carries the rewritten text's
    * md5 + before/after token counts — the verifiable receipt of a corpus
    * rewrite. Intra-document repeats (same chunk twice in ONE doc only)
    * are kept, matching [[chunkDedup]]'s cross-document rule.
    *
    * Scale shape: chunks collapse to 8-byte hashes at the scan and the
    * dup set is a hash-keyed aggregate — the pairing work never touches
    * strings. What returns to each document is only its list of DROPPED
    * CHUNK INDICES (ints; rows exist only for docs that lose a chunk), and
    * the rewrite re-slices the doc's own token array locally. The one
    * place the corpus itself can move is the doc_id co-location join with
    * that drop list: AQE broadcasts the usually-small list (making the
    * corpus side exchange-free), but no broadcast is *assumed* — a
    * pathologically duplicated corpus degrades to one shuffle, never OOM
    * (the [[chunkDedup]] principle).
    *
    * The chunked corpus persists MEMORY_AND_DISK inside the returned plan
    * (read by the dup set, the drop list, and the rewrite) — see the cache
    * lifecycle note at the top of [[TextDedup]]. */
  def dupSpanRemoval(docs: DataFrame, c: Int = ChunkTokens): DataFrame = {
    val withChunks = docs
      .withColumn("w", split(col("text"), " "))
      .withColumn("nc", expr(s"size(w) div $c"))
      .withColumn("ch",
        when(col("nc") >= 1, expr(
          s"""transform(sequence(0, nc - 1),
             |  i -> xxhash64(concat_ws(' ', slice(w, i * $c + 1, $c))))""".stripMargin))
          .otherwise(expr("array()")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunks = withChunks.select(col("doc_id"),
      posexplode(col("ch")).as(Seq("i", "h")))
    val dupSet = chunks.groupBy("h")
      .agg(countDistinct("doc_id").as("dd"))
      .filter(col("dd") > 1).select("h")
    val dropIdx = chunks.join(dupSet, Seq("h"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("i"))).as("drop_is"))
    withChunks
      .join(dropIdx, Seq("doc_id"), "left")
      .withColumn("drop_is", coalesce(col("drop_is"),
        expr("CAST(array() AS ARRAY<INT>)")))
      .withColumn("kept_text",
        when(col("nc") >= 1, expr(
          s"""concat_ws(' ', concat(
             |  flatten(transform(
             |    filter(sequence(0, nc - 1), i -> NOT array_contains(drop_is, i)),
             |    i -> slice(w, i * $c + 1, $c))),
             |  slice(w, nc * $c + 1, size(w) - nc * $c)))""".stripMargin))
          .otherwise(concat_ws(" ", col("w"))))
      .select(col("doc_id"),
        col("nc").cast("long").as("n_chunks"),
        size(col("drop_is")).cast("long").as("n_dropped"),
        (size(col("w")) - size(col("drop_is")) * c).cast("long").as("n_tok_after"),
        md5(encode(col("kept_text"), "UTF-8")).as("kept_md5"))
      .orderBy("doc_id")
  }

  /** Fixpoint-iteration ceiling for [[dedupClusters]]. Min-label
    * propagation converges in O(component diameter) rounds; duplicate
    * clusters are near-cliques (every member pairs with most others), so
    * organic diameters are 2–3 and convergence takes a handful of rounds.
    * The ceiling is a runaway guard — hitting it throws rather than
    * silently emitting unconverged labels. */
  val ClusterMaxIters = 50

  /** Edge cap for [[dedupClusters]]' driver union-find fast path: 2^18
    * symmetrized edge structs (= 65k input pairs, single-digit MB
    * collected). Chosen well past every contracted-label-graph size a
    * micro-batch can produce at gate scale, and well under driver-memory
    * risk at any scale — a bounded-by-design collect, like the
    * incrTriangles broadcast threshold. Value and bounding argument live
    * in [[graft.operators.DriverGates.SmallGraphEdgeCap]] with the other
    * gate budgets. */
  val SmallGraphEdgeCap: Long = graft.operators.DriverGates.SmallGraphEdgeCap

  /** Connected-components resolution over a near-dup pair list — the step
    * that turns any of the pair families ([[minhashNearDup]],
    * [[ngramJaccardNearDup]], [[simhashNearDup]], [[winnowOverlapPairs]],
    * embedding near-dup) into per-document keep/drop decisions: near-dup
    * similarity is not transitive, but retention policy must be (if A~B
    * and B~C, keeping both A and C still leaves near-dups of B in the
    * corpus), so real pipelines collapse pairs into components and keep
    * one representative per component.
    *
    * Input: (doc_a, doc_b) pairs, doc_a < doc_b. Output one row per
    * document that appears in any pair: (doc_id, cluster_id, n_members,
    * keep) where cluster_id = the component's minimum doc_id and
    * keep ⇔ doc_id == cluster_id. Sorted by doc_id.
    *
    * Scale shape: iterative min-label propagation — labels(v) starts at
    * min(v, neighbors(v)) and each round takes the min over the
    * neighborhood. Self-loops in the cached edge list make each round a
    * SINGLE (shuffle join on the edge key + partial-aggregated min):
    * min over nbrs ∪ self IS the next label, so there is no separate
    * old⋈new join, and convergence falls out of the label sum — labels
    * only ever decrease, so the (overflow-safe decimal) sum is strictly
    * decreasing until fixpoint. All executor-side; the driver sees one
    * scalar per round. The edge list is |pairs| rows — orders of
    * magnitude smaller than the corpus, since only documents with at
    * least one near-dup appear. `localCheckpoint` truncates each round's
    * lineage so the plan doesn't grow with iteration count. Rounds =
    * O(diameter), and dedup components are near-cliques (see
    * [[ClusterMaxIters]]); a corpus whose pair graph forms long chains
    * would want the O(log² n) large-star/small-star variant instead —
    * same join primitives, more rounds-parallel pointer jumping. */
  def dedupClusters(pairs0: DataFrame,
      smallGraphCap: Long = SmallGraphEdgeCap): DataFrame = {
    // a null id carries no joinable identity: a half-null pair can glue
    // nothing, and the two execution paths previously disagreed on it
    // (the distributed fixpoint dropped such rows through join/aggregate
    // null semantics; the driver union-find NPE'd). Dropped uniformly
    // HERE, before the gate, so both paths see identical inputs.
    val pairs = pairs0.filter(
      col("doc_a").isNotNull && col("doc_b").isNotNull)
    // symmetric edge list + self-loops, built in ONE pass over the (often
    // expensive — an LSH pipeline) pair frame via explode: a union of
    // re-selects would re-evaluate that pipeline per branch. Per-vertex
    // self-loop duplicates (one per incident pair) are harmless under the
    // min aggregate and cheaper than a distinct shuffle. Pre-partitioned
    // on the per-round join key and persisted: every round's neighbor
    // join reuses the cached partitioning for the edge side (AQE handles
    // the labels side), so only the label frame moves per round.
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("s"), col("doc_b").as("d")),
        struct(col("doc_b").as("s"), col("doc_a").as("d")),
        struct(col("doc_a").as("s"), col("doc_a").as("d")),
        struct(col("doc_b").as("s"), col("doc_b").as("d")))).as("e"))
      .select(col("e.s").as("s"), col("e.d").as("d"))
      .repartition(col("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Small-graph gate (the incrTriangles broadcast-threshold pattern,
    // operators/Graph.scala): a distributed fixpoint costs a job wave per
    // round plus broadcast builds — ~30 scheduler waves that dwarf the
    // actual work once the edge list is small. m37's per-batch CONTRACTED
    // label graphs (≤ 2·|batch| nodes by construction) live entirely in
    // that regime, so each micro-batch paid seconds of pure scheduling.
    // Under the cap (≤ 2^18 symmetrized edge structs ≈ 65k input pairs,
    // a few MB collected) the component labels come from a driver-side
    // union-find instead — same labels bit-for-bit: min id per component.
    // Above the cap nothing changes but one count on the already-needed
    // cache; the 100 TB path stays the cached one-job-per-round fixpoint.
    // integral ids only — the same contract the distributed path already
    // enforces (its convergence probe sums labels as decimal), so the two
    // paths accept exactly the same inputs
    val smallOrd: Option[Ordering[Any]] = pairs.schema("doc_a").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => Some(
        Ordering.by[Any, Long](v => v.asInstanceOf[Number].longValue()))
      case _ => None // non-integral key types keep the distributed path
    }
    if (smallOrd.isDefined && smallGraphCap > 0 && edges.count() <= smallGraphCap) {
      implicit val ord: Ordering[Any] = smallOrd.get
      val parent = scala.collection.mutable.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.collect().foreach { row => // from the cache just counted
        val s = row.get(0); val d = row.get(1)
        parent.getOrElseUpdate(s, s)
        parent.getOrElseUpdate(d, d)
        val (rs, rd) = (find(s), find(d))
        if (rs != rd) parent(rs) = rd
      }
      val minOfRoot = scala.collection.mutable.HashMap[Any, Any]()
      parent.keys.foreach { n =>
        val r = find(n)
        minOfRoot(r) = minOfRoot.get(r).fold(n)(ord.min(_, n))
      }
      edges.unpersist()
      val idType = pairs.schema("doc_a").dataType
      val labelSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", idType),
        org.apache.spark.sql.types.StructField("cluster_id", idType)))
      import scala.jdk.CollectionConverters._
      val rows: java.util.List[org.apache.spark.sql.Row] =
        parent.keys.toSeq.map(n =>
          org.apache.spark.sql.Row(n, minOfRoot(find(n)))).asJava
      return pairs.sparkSession.createDataFrame(rows, labelSchema)
        .withColumn("n_members", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
        .withColumn("keep", col("doc_id") === col("cluster_id"))
        .select("doc_id", "cluster_id", "n_members", "keep")
        .orderBy("doc_id")
    }

    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val s = df.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head().getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s // empty pair list
    }

    // ONE job per round, not two: each round's label frame is persisted
    // and the convergence probe's sum action both populates the cache
    // and reads the metric — a localCheckpoint + separate sum action
    // paid 2 job waves per round, pure floor on the job-floor-bound
    // fixpoints (m37's contracted graphs especially). Lineage nests one
    // cached join+agg per round; a checkpoint every 8th round bounds
    // the analyzer's re-walk for near-ClusterMaxIters chains.
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val cached = scala.collection.mutable.Buffer[DataFrame]()
    var labels = edges.groupBy("s").agg(min("d").as("cluster_id"))
      .withColumnRenamed("s", "doc_id")
      .persist(mem)
    cached += labels
    val out = try {
      var prevSum = labelSum(labels)
      var converged = false
      var iters = 0
      while (!converged) {
        iters += 1
        require(iters <= ClusterMaxIters,
          s"dedupClusters did not converge in $ClusterMaxIters rounds — " +
            "pathological chain-shaped pair graph; use a star-contraction variant")
        // each node pulls the minimum label across its neighborhood ∪ self
        var next = edges
          .join(labels.withColumnRenamed("doc_id", "d"), Seq("d"))
          .groupBy(col("s").as("doc_id")).agg(min("cluster_id").as("cluster_id"))
        next = if (iters % 8 == 0) next.localCheckpoint()
               else { val p = next.persist(mem); cached += p; p }
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
        labels = next
      }
      // pin the result off the cache chain before releasing it — the
      // caller's actions must never re-walk the nested round plans
      labels.localCheckpoint()
    } finally {
      cached.foreach(df => df.unpersist(): Unit)
      edges.unpersist()
    }
    out
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .select("doc_id", "cluster_id", "n_members", "keep")
      .orderBy("doc_id")
  }

  /** Fused [[minhashNearDup]] → [[dedupClusters]]: retention decisions
    * straight from the minhash near-dup graph, clustered at
    * REPRESENTATIVE granularity. Output is bit-identical to
    * `dedupClusters(minhashNearDup(docs).select("doc_a","doc_b"))`
    * (the replication-equivalence spec leg proves it on a replicated
    * corpus including over-cap and empty-gram groups) — but the member
    * EXPANSION, the pair list's one term quadratic in replica depth,
    * never happens: components run over the verified rep pairs and ONE
    * member remap join restores document granularity, so pair volume is
    * quadratic in DISTINCT documents only. Identity arguments:
    *
    *  - cross pairs connect every member of group A to every member of
    *    group B exactly when (repA, repB) verified — at member level the
    *    two whole groups land in one component, which is what labeling
    *    every member with its rep's component computes directly;
    *  - intra pairs clique a group of 2..[[MinhashBucketCap]] members
    *    with a nonempty gram set — a singleton rep component when the
    *    rep has no cross pair (over-cap / empty-gram groups expand no
    *    intra pairs, so a rep-pair-less such group appears in NO pair
    *    and must be absent from the output — and is);
    *  - cluster ids agree because a group's rep IS its min doc_id, so
    *    min over a rep component = min over its member component. */
  def minhashClusters(docs: DataFrame,
      smallGraphCap: Long = SmallGraphEdgeCap): DataFrame = {
    val (withRep, vpairs) = lshRepPairs(
      docs.select(col("doc_id"),
        graft.functions.TrigramHashes(split(col("text"), " ")).as("hset")),
      threshold = 0.8, minBandMatches = 1)
    val repLabels = dedupClusters(
        vpairs.select("doc_a", "doc_b"), smallGraphCap)
      .select(col("doc_id").as("rep"), col("cluster_id"))
    // groups whose intra clique is their only edges: exactly the intra-
    // expansion-eligible groups whose rep is in no verified pair
    val intraOnly = withRep
      .filter(col("doc_id") === col("rep") &&
        col("grp_n").between(2, MinhashBucketCap) && size(col("hset")) > 0)
      .select(col("rep"))
      .join(repLabels.select("rep"), Seq("rep"), "left_anti")
      .select(col("rep"), col("rep").as("cluster_id"))
    withRep.select(col("doc_id"), col("rep"))
      .join(repLabels.unionByName(intraOnly), "rep")
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
      .select("doc_id", "cluster_id", "n_members", "keep")
      .orderBy("doc_id")
  }

  // SimHash: 32-bit fingerprint; pairs within Hamming distance <= 1 must
  // share one of 2 exact 16-bit halves (pigeonhole).
  val SimhashBits = 32
  val SimhashMaxHamming = 1

  // Token hash (inside simhash's transform lambda) is shared bit-for-bit
  // with the DuckDB oracle: first 8 hex chars of md5(token), unsigned 32.

  /** Per-document 32-bit SimHash over whitespace tokens (with multiplicity):
    * bit i of the fingerprint is set iff the count of tokens with bit i set
    * exceeds the count without. Tokenize per row, then the codegen'd
    * `simhash_fp` Expression hashes and bit-votes in one primitive loop —
    * no explode, no shuffle, no 32-buffer aggregate, no intermediate hex
    * strings (the MinHashSig lesson). */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHashFp(split(col("text"), " ")).as("fp"))

  /** Near-duplicate pairs with SimHash Hamming distance <= 1, candidates
    * from 16-bit band equality. Output: (doc_a, doc_b, hamming), sorted.
    *
    * Same duplicate-collapse as [[lshVerifiedPairs]] (trivial here — the
    * fingerprint IS the group key): equal-fingerprint docs reduce to one
    * representative before the band self-join, so a group of d copies
    * costs d rows instead of d² candidates; intra-group pairs expand back
    * with hamming 0, cross pairs inherit the representative distance.
    * Output is unchanged. */
  def simhashNearDup(docs: DataFrame): DataFrame = {
    val wg = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val withRep = simhash(docs)
      .withColumn("rep", min("doc_id").over(wg))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniq = withRep.filter(col("doc_id") === col("rep"))
      .select(col("doc_id"), col("fp"))
    val bands = uniq.withColumn("band",
      explode(array(
        struct(lit(0).as("idx"), col("fp").bitwiseAND(lit(0xFFFFL)).as("v")),
        struct(lit(1).as("idx"), shiftright(col("fp"), 16).as("v")))))
      .select(col("doc_id"), col("band.idx").as("band_idx"), col("band.v").as("band_val"), col("fp"))

    // aliased self-join: both sides canonicalize to the same plan, so the
    // band shuffle is written once and ReusedExchange serves the other side
    val vpairs = bands.as("x")
      .join(bands.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= SimhashMaxHamming)

    val ma = withRep.select(col("rep").as("doc_a"), col("doc_id").as("m_a"))
    val mb = withRep.select(col("rep").as("doc_b"), col("doc_id").as("m_b"))
    val cross = vpairs
      .join(ma, "doc_a").join(mb, "doc_b")
      .select(least(col("m_a"), col("m_b")).as("doc_a"),
        greatest(col("m_a"), col("m_b")).as("doc_b"), col("hamming"))
    val im = withRep.select(col("rep"), col("doc_id"))
    val intra = im.as("x")
      .join(im.as("y"),
        col("x.rep") === col("y.rep") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        lit(0).cast("int").as("hamming"))

    cross.unionByName(intra).orderBy("doc_a", "doc_b")
  }

  /** Document frequency above which a shingle is excluded from containment
    * pairing — a gram in more documents than this is boilerplate, not
    * evidence of copying, and df-capping is what keeps the posting
    * self-join's pair volume ≤ Σ df² linear-ish at corpus scale. */
  val ContainmentDfCap = 64

  /** Asymmetric containment detection — the duplication geometry every
    * symmetric family here is blind to: a short document quoted wholesale
    * inside a long one has containment(short→long) ≈ 1 but Jaccard ≈
    * |short|/|long| ≈ 0, so minhash/simhash/jaccard gates (l2/l7/l12) never
    * fire. Broder's containment C(A→B) = |A∩B|/|A| over the word-trigram
    * shingle sets catches quotes, boilerplate inclusion, and page-in-page
    * syndication.
    *
    * Candidates come from a document-frequency-capped posting self-join on
    * 60-bit gram hashes: grams in more than [[ContainmentDfCap]] documents
    * are dropped BEFORE pairing (`shared` is therefore a lower bound
    * counted over discriminative grams only — a pair sharing nothing but
    * boilerplate is exactly the pair this operator should not emit), while
    * the containment denominators stay the FULL per-document distinct gram
    * counts. Both containment directions and the Jaccard are emitted so a
    * consumer separates subset-inclusion (high max-containment, low
    * Jaccard) from near-identity (both high).
    *
    * Scale shape: the gram sets come from the codegen'd [[NGramHashes]]
    * kernel (the HOF string-shingle form costs ~50 µs/row — the l2/l29
    * lesson, re-measured here), so postings shuffle 8-byte hashes and
    * strings are never materialized; the df cap bounds every posting
    * list, so pair volume is ≤ Σ df² with df ≤ the cap — no quadratic
    * bucket. The pair aggregate shuffles on the (doc_a, doc_b) key, and
    * the two size joins are plain co-partitioned equi-joins. The oracle
    * groups on gram STRINGS — agreement is modulo 2⁻⁶⁴ XXH64 collisions
    * (the [[graft.llm.TextStats.topNgrams]] caveat), which could only
    * perturb `shared`/`n` by colliding grams inside one document. */
  /** Content-defined chunking dedup — the rsync/FastCDC face of chunk
    * dedup: boundaries are picked by the CONTENT (a rolling window's hash
    * hitting a mask), not by fixed offsets, so inserting one token shifts
    * at most the chunk it lands in — where [[chunkDedup]]'s fixed
    * 20-token grid re-aligns every chunk after the edit and misses all of
    * them. A cut lands after token i iff the md5 of the ≤4-token window
    * ending at i starts with hex '0' (p = 1/16 → mean chunk ≈ 16
    * tokens). md5, not xxhash64, *because the decision must be the
    * oracle's too*: DuckDB reproduces the identical boundaries, chunk
    * strings, and fingerprints (the l37 md5-as-uniform principle —
    * engine-invariant randomness).
    *
    * Output per doc: chunk count, how many of its chunks also appear in
    * another document, and the shared fraction — the per-doc duplication
    * exposure that decides rewrite-vs-drop.
    *
    * Scale shape: boundary selection and chunk assembly are one per-row
    * projection (array HOFs over the token array — zero shuffle);
    * the dup-set lookup is the [[chunkDedup]] pair of fingerprint-keyed
    * partial-aggregated shuffles, AQE-broadcast when the shared set is
    * small. Per-task work is bounded by row size; no window, no funnel. */
  def cdcChunks(docs: DataFrame): DataFrame = {
    // the per-token rolling md5 is the most expensive per-row kernel in
    // the module (~30 s serialized on a one-partition scan at sf0.1) —
    // spread first; no-op at real scan parallelism
    val ex = TextStats.spread(docs)
      .withColumn("w", split(col("text"), " "))
      .withColumn("cuts", expr(
        """CASE WHEN size(w) >= 2 THEN
          |  filter(sequence(0, size(w) - 2),
          |    i -> substring(md5(concat_ws(' ',
          |           slice(w, greatest(i - 2, 1), least(i + 1, 4)))), 1, 1) = '0')
          |ELSE array() END""".stripMargin))
      .withColumn("starts", expr(
        "concat(array(0), transform(cuts, p -> p + 1))"))
      .withColumn("ends", expr(
        "concat(cuts, array(size(w) - 1))"))
      .withColumn("chunk", explode(expr(
        "zip_with(starts, ends, (s, e) -> concat_ws(' ', slice(w, s + 1, e - s + 1)))")))
      .select(col("doc_id"), md5(col("chunk")).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // cache lifecycle: caller-owned, as for the sibling dedup functions
    val share = ex.groupBy("fp").agg(countDistinct(col("doc_id")).as("nd"))
    ex.join(share, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_ratio",
        col("n_shared").cast("double") / col("n_chunks"))
      .select("doc_id", "n_chunks", "n_shared", "shared_ratio")
      .orderBy("doc_id")
  }

  def containmentPairs(docs: DataFrame, minShared: Int = 3,
      minContainment: Double = 0.2): DataFrame = {
    val hsets = docs.select(col("doc_id"),
      graft.functions.NGramHashes(split(col("text"), " "), 3).as("hs"))
    val sizes = hsets.select(col("doc_id"),
      size(col("hs")).cast("long").as("n"))
    // persisted so the df aggregate and both self-join sides read 8-byte
    // rows from cache instead of re-running the corpus scan (the l20
    // postings pattern; see the cache-lifecycle note above)
    val posts = hsets
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfOk = posts.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") <= ContainmentDfCap).select("h")
    val capped = posts.join(dfOk, Seq("h"))
    val pairs = capped.select(col("h"), col("doc_id").as("doc_a"))
      .join(capped.select(col("h"), col("doc_id").as("doc_b")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n", "n_a"), Seq("doc_a"))
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n", "n_b"), Seq("doc_b"))
      .withColumn("cont_a", col("shared") * lit(1.0) / col("n_a"))
      .withColumn("cont_b", col("shared") * lit(1.0) / col("n_b"))
      .withColumn("jaccard",
        col("shared") * lit(1.0) / (col("n_a") + col("n_b") - col("shared")))
      .filter(greatest(col("cont_a"), col("cont_b")) >= minContainment)
      .select("doc_a", "doc_b", "shared", "n_a", "n_b",
        "cont_a", "cont_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Unicode-canonical text form: NFC compose (the custom codegen'd
    * [[graft.functions.NfcNormalize]]), THEN lowercase (NFC first —
    * lowercasing can itself denormalize, e.g. İ → i + U+0307), then
    * whitespace-collapse and trim. The canonicalization layer every
    * byte-keyed dedup stage should share: composed "café" and decomposed
    * "cafe&#x301;" are one document to it. */
  def canonText(text: Column): Column =
    trim(regexp_replace(lower(graft.functions.NfcNormalize(text)),
      "\\s+", " "))

  /** Canonical-form exact dedup: md5 over [[canonText]], groups with >1
    * member expanded back to (doc_id, rep_doc, n_members). Same
    * one-fingerprint-shuffle shape as [[exactDedup]]; the group table is
    * duplicate-group-sized, so the member join broadcasts at any corpus
    * scale with a bounded duplicate population. */
  def canonDedup(docs: DataFrame): DataFrame = {
    val c = docs.select(col("doc_id"),
      md5(canonText(col("text"))).as("cfp"))
    val g = c.groupBy("cfp")
      .agg(min("doc_id").as("rep_doc"), count(lit(1)).as("n_members"))
      .filter(col("n_members") > 1)
    c.join(g, "cfp")
      .select("doc_id", "rep_doc", "n_members")
      .orderBy("doc_id")
  }
}
