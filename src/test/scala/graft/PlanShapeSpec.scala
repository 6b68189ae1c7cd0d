package graft

import org.apache.spark.sql.functions.col

import graft.queries.AnalyticsQueries

/** Pins the physical-plan shapes the 100 TB story depends on — a conf or
  * refactor that regresses one of these (a broadcast silently becoming a
  * sort-merge join, a filter no longer reaching the scan, partial
  * aggregation disappearing) fails here rather than in production. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q3: dimension joins broadcast; no sort-merge join in the plan") {
    val p = plan("q3_join")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"), "fact table must not pre-shuffle")
  }

  test("q35: EXISTS/NOT EXISTS decorrelate to semi/anti hash joins") {
    val p = plan("q35_exists")
    assert(p.contains("LeftSemi"), p.take(1200))
    assert(p.contains("LeftAnti"), p.take(1200))
    // decorrelation must never fall back to a per-row nested-loop probe
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1200))
  }

  test("q36: all three window functions ride one o_custkey exchange, one Window node") {
    val p = plan("q36_window_dist")
    val hashEx = p.linesIterator.count(_.contains("hashpartitioning("))
    assert(hashEx == 1, s"expected one hash exchange, got $hashEx:\n${p.take(1200)}")
    val windows = p.linesIterator.count(_.trim.matches("""\(\d+\) Window"""))
    assert(windows == 1, s"expected one Window node, got $windows")
  }

  test("l64: count-min sketch aggregate is partial (mergeable cells) and broadcast to the probe") {
    val p = plan("l64_countmin")
    assert(p.contains("partial_count"), p.take(1000))
    assert(p.contains("BroadcastExchange"), p.take(1000))
  }

  test("l65: bloom set-bit table broadcasts; probe side never shuffles on fp") {
    val p = plan("l65_bloom_audit")
    assert(p.contains("BroadcastExchange"), p.take(1000))
  }

  test("q1: aggregation is partial before the exchange (map-side combine)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), p.take(500))
  }

  test("q2: every filter reaches the parquet scan") {
    val p = plan("q2_pushdown")
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_quantity"), p.take(800))
  }

  test("q2: scan reads only the projected columns") {
    val p = plan("q2_pushdown")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_comment") && !read.contains("l_partkey"),
      s"column pruning lost: $read")
  }

  test("l4: probe filter is pushed and probes broadcast") {
    val p = plan("l4_ann_lsh")
    assert(p.contains("LessThan(vec_id,20)") && p.contains("BroadcastExchange"),
      p.take(800))
  }

  test("l4: annLsh re-rank is two-phase — partial window on (query_id, pid)") {
    val p = plan("l4_ann_lsh")
    // a bucket is an O(N/2^planes) share of the table: the per-probe window
    // must never be single-task (r3 verdict #1, same trick as l3/m5)
    assert(p.contains("pid"), p.take(800))
    val windows = p.linesIterator.count(_.contains("Window"))
    assert(windows >= 2, s"expected two window stages, plan:\n${p.take(800)}")
  }

  test("l10: annIvf re-rank is two-phase — partial window on (query_id, pid)") {
    val p = plan("l10_ann_ivf")
    // an inverted list is an O(N/cells) share of the table (r3 verdict #1)
    assert(p.contains("pid"), p.take(800))
    val windows = p.linesIterator.count(_.contains("Window"))
    assert(windows >= 2, s"expected two window stages, plan:\n${p.take(800)}")
  }

  test("m5: two-phase top-N keeps the salted window before the global one") {
    val p = plan("m5_newest_per_topic")
    // phase-1 window partitions on (event_type, pid) — the salt column
    assert(p.contains("pid"), p.take(800))
  }

  test("l3: annBrute top-K is two-phase — partial window on (query_id, pid)") {
    val p = plan("l3_ann_brute")
    // phase-1 window must partition on the physical-partition salt so no
    // task ever sorts a probe's full candidate set (r2 verdict #4)
    assert(p.contains("pid"), p.take(800))
    val windows = p.linesIterator.filter(_.contains("Window")).size
    assert(windows >= 2, s"expected two window stages, plan:\n${p.take(800)}")
  }

  test("l52: hardNegatives top-K is two-phase — partial window on (query_id, pid)") {
    val p = plan("l52_hard_negatives")
    // same contract as l3: the label filter must not cost the plan its
    // two-phase tournament (no task sorts a probe's full candidate set)
    assert(p.contains("pid"), p.take(800))
    val windows = p.linesIterator.filter(_.contains("Window")).size
    assert(windows >= 2, s"expected two window stages, plan:\n${p.take(800)}")
    assert(p.contains("BroadcastExchange"), "probes must broadcast")
  }

  test("m23: MAD stats broadcast onto the event scan; percentiles partial") {
    val p = plan("m23_mad_outliers")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      "the 5-row stats must broadcast, never shuffle the events")
    assert(p.contains("partial_percentile"), "percentiles must map-side combine")
  }

  test("m24: exact windowed distinct is the two-phase distinct-agg plan") {
    val p = plan("m24_window_distinct")
    // phase 1 must AGGREGATE ON (window, type, user) so the distinct
    // count map-side-combines — the key property that holds at 100 TB.
    // partial_count alone would pass via the plain count(1); pin the
    // aggregate keys instead.
    assert(p.linesIterator.exists(l =>
      l.contains("Keys") && l.contains("user_id")), p.take(1200))
    assert(p.contains("partial_count"), p.take(800))
    assert(!p.contains("SortMergeJoin"))
  }

  test("l12: near-dup pipeline reads the gram sets from cache, not re-derived") {
    val p = plan("l12_ngram_jaccard")
    // the persisted hash-set frame must serve every stage (sig, bands,
    // verify, expansion) — losing the cache re-runs gram hashing per stage
    assert(p.contains("InMemoryTableScan"), p.take(800))
  }

  test("l13: fingerprinting is a pure projection — no mid-plan exchange") {
    val p = SparkEntry.queries("l13_winnow_fp")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // only the final orderBy's range partitioning may exchange
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"winnow fingerprint plan grew a shuffle:\n$p")
    assert(!p.contains("Window"), "per-row kernel must not become a window op")
  }

  test("l14: indexed IVF probes prune to the probed cell partitions (DPP)") {
    val p = plan("l14_ann_ivf_indexed")
    // the probe join key is the index's partition column — dynamic
    // partition pruning must reach the scan so only probed inverted
    // lists are read (the whole point of persisting the index)
    assert(p.toLowerCase.contains("dynamicpruning"), p.take(1200))
    assert(p.contains("pid"), "re-rank must stay two-phase")
  }

  test("l19: repetition signals are a pure projection — no mid-plan exchange") {
    val p = SparkEntry.queries("l19_repetition")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // run-length mode fold + distinct-count kernels stay per-row; only
    // the final orderBy's range partitioning may exchange
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"repetition stats plan grew a shuffle:\n$p")
    assert(!p.contains("Window") && !p.toLowerCase.contains("generate"),
      "mode must not become an explode+window/groupBy")
  }

  test("l20: winnow postings cached — kernel+df-window run once; count is partial") {
    val p = plan("l20_winnow_overlap")
    // both self-join sides must read the persisted posting frame (without
    // it Catalyst re-derives each side from the scan, evaluating the
    // fingerprint kernel 3x per row via the explode's implicit filter),
    // and the per-pair count must partial-aggregate before its exchange
    assert(p.contains("InMemoryTableScan"), p.take(800))
    assert(p.contains("partial_count"), "pair count must map-side combine")
  }

  test("l21: semdedup cell assignment cached — serves both join sides + flag join") {
    val p = plan("l21_semdedup")
    assert(p.contains("InMemoryTableScan"), p.take(800))
    // the expensive nearest_cells expression must not appear in the plan
    // more than once (one materialization feeds every consumer)
    assert(p.linesIterator.count(_.contains("nearest_cells")) <= 1, p.take(1200))
  }

  test("l23: chunk dedup hashes at the scan, aggregates partial, no cross join") {
    val p = plan("l23_chunk_dedup")
    // chunk text collapses to xxhash64 before any exchange; both the
    // per-chunk doc count and the per-doc dup count map-side combine;
    // the duplicated-set join must stay an equi-join (AQE may broadcast
    // it at runtime, but nothing may plan a cartesian)
    assert(p.contains("xxhash64"), p.take(800))
    assert(p.contains("partial_count"), "chunk counts must map-side combine")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "dup-set membership must be an equi-join")
  }

  test("l24: tfidf joins N as broadcast; tf aggregate is partial") {
    val p = plan("l24_tfidf_keywords")
    // the corpus-size frame is one row — it must broadcast, never shuffle
    // the tf side against it; tf itself map-side combines
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(800))
    assert(p.contains("partial_count"), "tf must map-side combine")
  }

  test("c2: quality gate is a pure projection — no mid-plan exchange") {
    val p = SparkEntry.queries("c2_quality_filter")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // every rule signal is a per-row kernel; only the oracle orderBy's
    // range partitioning may exchange (the l19 contract)
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"quality gate grew a shuffle:\n$p")
    assert(!p.contains("Window") && !p.toLowerCase.contains("generate"),
      "rule signals must not become an explode+window/groupBy")
  }

  test("q4 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q4_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("l27: stratified sample is two-phase — partial window on (stratum, pid)") {
    val p = plan("l27_stratified_sample")
    // one stratum can be most of the corpus: the per-stratum rank must
    // never be single-task (same tournament as m5/l3)
    assert(p.contains("pid"), p.take(800))
    val windows = p.linesIterator.count(_.contains("Window"))
    assert(windows >= 2, s"expected two window stages, plan:\n${p.take(800)}")
  }

  test("l28: pii scrub is a pure projection — no mid-plan exchange, no UDF") {
    val p = SparkEntry.queries("l28_pii_scrub")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"pii scrub grew a shuffle:\n$p") // only the orderBy
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("l18: incremental dedup never shuffles the corpus — broadcast both passes") {
    val p = plan("l18_incr_dedup")
    // corpus side: map-side broadcast semi join; batch side: broadcast
    // anti join — the only exchanges carry batch-bounded frames
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"corpus fingerprints must not shuffle:\n${p.take(1200)}")
  }

  test("q12: as-of join is the one-shuffle sort-merge shape, no nested loop") {
    val p = plan("q12_asof")
    // the union+running-last formulation must not degenerate into the
    // quadratic plans Spark gives naive as-of attempts
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
    assert(p.contains("Window"), p.take(800))
    // both event_type filters reach the parquet scan
    assert(p.contains("EqualTo(event_type,click)") &&
      p.contains("EqualTo(event_type,purchase)"), p.take(1200))
  }

  test("q13: range join is an equi-join on the bin id, no nested loop") {
    val p = plan("q13_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
    // tiny interval side broadcasts; at scale the same plan shuffles on
    // the bin key — either way it's a hash join, never a nested loop
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(1200))
  }

  test("m11: grid broadcasts; series side never becomes a nested loop") {
    val p = plan("m11_resample")
    // keys × grid is a broadcast nested loop ONLY of the 1-row-exploded
    // grid (that is the design: the corpus-sized series side stays
    // distributed); the points-to-grid join must be a hash join
    assert(p.contains("BroadcastExchange"), p.take(1200))
    assert(!p.contains("CartesianProduct"), p.take(1200))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(1200))
  }

  test("m12: rate is one window exchange, no join") {
    val p = plan("m12_rate")
    assert(p.contains("Window"), p.take(800))
    assert(!p.linesIterator.exists(l => l.contains("Join")),
      s"rate must not join:\n${p.take(1200)}")
  }

  test("q14: pivot aggregates partial before the exchange") {
    val p = plan("q14_pivot")
    assert(p.contains("partial_pivot") || p.contains("partial_count") ||
      p.contains("partial_sum"), p.take(1200))
  }

  test("l30: quantization audit is a pure projection — no mid-plan exchange") {
    val p = SparkEntry.queries("l30_vec_quantize")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"quantize grew a shuffle:\n$p") // only the orderBy
  }

  test("q15: interval overlap is an equi-join on the bin id — no nested loop, no dedup shuffle") {
    val p = plan("q15_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
    // canonical-bin emission replaces distinct(): no aggregate on the
    // joined pairs may appear
    assert(!p.contains("partial_first"), p.take(1200))
  }

  test("l31: bm25 top-k is two-phase; df and stats broadcast") {
    val p = plan("l31_bm25")
    assert(p.contains("pid"), p.take(1200))
    val windows = p.linesIterator.count(_.contains("Window"))
    assert(windows >= 2, s"expected two window stages, plan:\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("l33: bigram novelty counts partial-aggregate and join on hashes") {
    val p = plan("l33_bigram_novelty")
    assert(p.contains("partial_count"), p.take(1200))
    // the gram lookup joins 8-byte hashes — no string shuffle: the only
    // string column in any exchange would be `text` itself
    assert(!p.linesIterator.exists(l =>
      l.contains("Exchange") && l.contains("text")), p.take(1600))
  }

  test("l32: source mix is one partial-aggregated shuffle + broadcast max") {
    val p = plan("l32_source_mix")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(1200))
    assert(p.contains("BroadcastExchange"), p.take(1200))
  }

  test("l36: chunk windows are a projection + explode — no mid-plan exchange") {
    val p = SparkEntry.queries("l36_chunk_windows")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    // only the final orderBy's range partitioning may exchange
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"chunk windows grew a shuffle:\n$p")
    assert(p.contains("Generate"), "explode must stay a Generate, not a join")
    assert(!p.contains("Join"), "no join belongs in a per-row chunker")
  }

  test("l35: seq pack is one shard window — no join in the plan") {
    val p = SparkEntry.queries("l35_seq_pack")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!p.contains("Join"), s"seq pack must not join:\n$p")
    // window hash partitioning + final orderBy range partitioning only
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"seq pack grew a shuffle:\n$p")
  }

  test("l37: weighted sample broadcasts the weights — corpus never sort-merges") {
    val p = plan("l37_weighted_sample")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "the source-cardinality weights frame must broadcast")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(1200))
  }

  test("l34: dup-span rewrite pairs on hashes — partial agg, no nested loop") {
    val p = plan("l34_dup_span_removal")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
    // the dup-set aggregate partial-combines map-side on the chunk hash
    assert(p.contains("partial_count"), p.take(1600))
  }

  test("q17: grouping sets expand then partial-aggregate before the exchange") {
    val p = plan("q17_grouping_sets")
    assert(p.contains("Expand"), p.take(1200))
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(1200))
  }

  test("l38: cluster sample is two-phase — partial window on (cell, pid)") {
    val p = plan("l38_cluster_sample")
    assert(p.contains("pid"), p.take(1200))
    val windows = p.linesIterator.count(_.contains("Window"))
    assert(windows >= 2, s"expected two window stages, plan:\n${p.take(1200)}")
  }

  test("l39: knn vote broadcasts the neighbor list — corpus never sort-merges") {
    val p = plan("l39_knn_label")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      "the probes×k neighbor frame must broadcast against the corpus")
  }

  test("l41: simpson diversity is a pure projection — no mid-plan exchange") {
    val p = SparkEntry.queries("l41_simpson_diversity")(spark, sf())
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"simpson diversity grew a shuffle:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      "the run-length fold must stay per-row")
  }

  test("l42: kmv k-smallest partial-aggregates map-side — no window, no sort") {
    val p = plan("l42_kmv_distinct")
    // the set-semantic KmvMinima aggregate must run as a two-phase
    // ObjectHashAggregate (partial map-side, final after a k-bounded
    // exchange) — a source's whole gram-hash set must never sort in one
    // task, and the window tournament must not come back (its per-task
    // evaluator-factory codegen was the sketch family's measured CPU
    // driver at gate scale)
    val oha = p.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(oha >= 2, s"expected partial+final ObjectHashAggregate:\n${p.take(1200)}")
    assert(!p.contains("Window"), s"window tournament resurfaced:\n${p.take(1200)}")
  }

  test("l43: containment pairs on hashed postings — no nested loop, partial aggs") {
    val p = plan("l43_containment")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
    // df cap and pair counting both partial-combine map-side
    assert(p.contains("partial_count"), p.take(1600))
  }

  test("q19: raw SQL plans like its DataFrame twin — broadcast dims, partial agg, pushed filter") {
    val p = plan("q19_sql")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "the fact table must not pre-shuffle")
    assert(p.contains("partial_sum"), p.take(800))
    assert(p.contains("EqualTo(o_orderstatus,F)"), p.take(1600))
  }

  test("q18: hist-quantile stats broadcast onto the scan; bin counts partial") {
    val p = plan("q18_hist_quantile")
    // the group-count-sized stats frame must broadcast, never shuffle the
    // corpus side; bin counting partial-combines map-side
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("m20: rolling aggregates are one window exchange, no join") {
    val p = plan("m20_moving_avg")
    // one Window node (all three frames share it), no join anywhere
    assert(p.linesIterator.count(_.startsWith("(")) == 0 ||
      p.contains("Window"), p.take(800))
    val windowNodes = p.linesIterator.count(_.matches("""\(\d+\) Window.*"""))
    assert(windowNodes == 1, s"expected ONE shared window stage:\n${p.take(1200)}")
    assert(!p.linesIterator.exists(_.contains("Join")),
      s"a trailing frame needs no join:\n${p.take(1200)}")
  }

  test("l46: ADC top-k is two-phase; probe tables broadcast") {
    val p = plan("l46_ann_pq")
    assert(p.contains("pid"), p.take(1200))
    val windows = p.linesIterator.count(_.contains("Window"))
    assert(windows >= 2, s"expected two window stages:\n${p.take(1200)}")
    assert(p.contains("BroadcastExchange"),
      "probes with their lookup tables must broadcast")
  }

  test("l47: IVFADC candidates come from a cell equi-join, not a cross join; two-phase top-k") {
    val p = plan("l47_ann_ivfpq")
    assert(p.contains("pid"), p.take(1200))
    val windows = p.linesIterator.count(_.contains("Window"))
    assert(windows >= 2, s"expected two window stages:\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin"),
      "probes join their nprobe cells as a broadcast equi-join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the cell restriction must bound the scan — no all-pairs join:\n${p.take(1200)}")
  }

  test("l44: collocation top-k is TakeOrdered; marginals broadcast") {
    val p = plan("l44_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must never be a global sort")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("q21: correlated subqueries decorrelate — aggregate-then-join, no per-row re-execution") {
    val p = plan("q21_correlated")
    // decorrelation rewrites the scalar subqueries into aggregates joined
    // back on o_custkey; a lingering nested-loop/cartesian means the
    // subquery would re-execute per outer row
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"the per-customer aggregate must partial-combine:\n${p.take(1200)}")
  }

  test("q22: funnel stages join broadcast — the event log never sort-merges") {
    val p = plan("q22_funnel")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"),
      s"stage frames are user-bounded and must broadcast:\n${p.take(1200)}")
  }

  test("q23: cohort join broadcasts the user dimension; aggs partial") {
    val p = plan("q23_cohort")
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    assert(!p.contains("SortMergeJoin"), p.take(1200))
    assert(p.contains("partial_count") || p.contains("partial_min"),
      p.take(1200))
  }

  test("m22: range frame is one window shuffle, no join") {
    val p = plan("m22_range_frame")
    // both frame aggregates ride ONE series-keyed exchange (the only
    // hash shuffle; the trailing range exchange is the output orderBy)
    val hashEx = p.linesIterator.count(_.contains("hashpartitioning(user_id"))
    assert(hashEx == 1, s"expected ONE series-keyed exchange:\n${p.take(1500)}")
    assert(!p.linesIterator.exists(_.contains("Join")),
      s"a range frame needs no join:\n${p.take(1200)}")
  }

  test("l48: truncation audit re-ranks two-phase; probes broadcast; one corpus scan") {
    val p = plan("l48_trunc_recall")
    assert(p.contains("pid"), p.take(1200))
    val windows = p.linesIterator.count(_.contains("Window"))
    assert(windows >= 4, s"both rankings must be two-phase:\n${p.take(1200)}")
    assert(p.contains("BroadcastExchange"), "probes must broadcast")
  }

  test("l49: token rarity aggregates partial — no window, no nested loop") {
    val p = plan("l49_token_rarity")
    assert(p.contains("partial_count"), p.take(1200))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1200))
    assert(!p.contains("Window"),
      "per-task work must be bounded by token frequency, not corpus size")
  }

  test("l50: cdc chunks assemble per-row; dup lookup partial-aggregates on fingerprints") {
    val p = plan("l50_cdc_chunks")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(1600))
    assert(p.contains("partial_count"), p.take(1600))
    assert(!p.contains("Window"),
      "chunk assembly is a projection — no per-doc window stage")
  }

  test("q26: bucketed join sort-merges with ZERO exchange on either side") {
    // the gate body eagerly writes both bucketed tables as a side effect
    SparkEntry.queries("q26_bucket_join")(spark, sf())
    val j = graft.operators.Bucketing
      .bucketJoin(spark, "graft_q26.orders_b", "graft_q26.customer_b", "custkey")
    val p = j.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("SortMergeJoin"), p.take(800))
    assert(!p.linesIterator.exists(_.contains("Exchange")),
      s"bucket co-location must eliminate both exchanges:\n${p.take(1600)}")
    assert(p.contains("SelectedBucketsCount"),
      s"both scans must be bucket-aware:\n${p.take(1600)}")
  }

  test("runtime bloom filter: a selective dim side seeds a might_contain on the fact scan") {
    // the row-level sibling of q28's partition-level pruning: when the
    // join key is NOT the partition column, Spark can still build a bloom
    // filter from the filtered dim side and apply it before the fact
    // side's shuffle — at 100 TB that turns a full-fact exchange into a
    // selectivity-sized one. Threshold confs exist for real clusters;
    // pinned here at test scale so a conf regression can't silently drop
    // the rewrite.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables.lineitem(spark, sf())
      val dim = Tables.orders(spark, sf())
        .filter(col("o_totalprice") > 400000.0).select("o_orderkey")
      val p = li.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag").count()
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("might_contain"),
        s"runtime bloom filter was not injected:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("q28: the dim filter dynamically prunes the fact scan's partitions") {
    val p = plan("q28_dpp")
    assert(p.contains("dynamicpruning"),
      s"fact PartitionFilters must carry the dim subquery:\n${p.take(2000)}")
  }

  test("q29: lateral LIMIT decorrelates — partial group-limit before the exchange") {
    val p = plan("q29_lateral")
    // the correlated ORDER BY…LIMIT must compile to WindowGroupLimit with
    // a PARTIAL stage ahead of the window exchange (the optimizer's
    // two-phase top-K) — never a per-outer-row loop join
    assert(p.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
      s"expected partial+final WindowGroupLimit:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"lateral must not plan as a loop join:\n${p.take(1200)}")
  }

  test("q30: rank pushdown bounds the listagg shuffle; nation broadcasts") {
    val p = plan("q30_listagg")
    assert(p.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
      s"expected partial+final WindowGroupLimit:\n${p.take(1200)}")
    assert(p.contains("BroadcastHashJoin"), "25-row nation must broadcast")
    // the ordered-concat aggregate map-side combines its 5-bounded groups
    assert(p.contains("partial_count"), p.take(1200))
  }

  test("l59: drift numerator partial-aggregates; totals ride as broadcasts") {
    val p = plan("l59_source_tvd")
    assert(p.contains("partial_sum"), p.take(1200))
    assert(p.contains("BroadcastExchange"),
      "per-source totals and the corpus total must broadcast")
    assert(!p.contains("SortMergeJoin"),
      s"the vocab join must not shuffle the counts at this size:\n${p.take(1200)}")
  }

  test("m26: trend statistics partial-aggregate in one shuffle, no window") {
    val p = plan("m26_trend")
    assert(p.contains("partial_sum"), p.take(1200))
    assert(!p.contains("Window") && !p.contains("Join"), p.take(1200))
    // one hash-agg exchange + the output sort's range exchange, no more
    // (formatted explain names each node twice: tree line + detail header)
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 4, s"expected 2 exchange nodes, got $exchanges lines:\n${p.take(1200)}")
  }

  test("q32: explicit-value pivot partial-aggregates, never joins") {
    val p = plan("q32_pivot")
    assert(p.contains("partial_"), p.take(1200))
    assert(!p.contains("Join"),
      s"pivot with explicit values must not discover values via a join/pass:\n${p.take(1200)}")
    // Spark's two-phase pivot: corpus-sized partial agg on (key, pivot),
    // then the pivot agg on the compacted frame, then the output sort —
    // 3 exchange nodes (each named twice in formatted explain), the
    // first the only corpus-sized one
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 6, s"expected 3 exchange nodes:\n${p.take(1200)}")
  }

  test("q33: unpivot expands without shuffle before the rollup") {
    val p = plan("q33_unpivot")
    assert(p.contains("Expand"), s"unpivot should compile to Expand:\n${p.take(1200)}")
    assert(p.contains("partial_"), p.take(1200))
    assert(!p.contains("Join") && !p.contains("Union"),
      s"the melt must be one pass, not a self-union:\n${p.take(1200)}")
  }

  test("c12: snapshot diff is one co-partitioned outer join on the key") {
    val p = plan("c12_snapshot_diff")
    assert(p.contains("FullOuter") || p.contains("full_outer"), p.take(1200))
    // both sides hash-partition on doc_id, join, filter, output sort —
    // no nested loop, no cartesian
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(1200))
  }

  test("l66: LM count tables partial-aggregate and broadcast onto the instance scan") {
    val p = plan("l66_lm_perplexity")
    // both count aggregates partial-combine map-side (hash-keyed, the
    // l29 principle) ...
    assert(p.contains("partial_count"), p.take(1000))
    // ... and at gate scale the vocab-bounded tables broadcast; no
    // nested loop anywhere (the vocab scalar rides a 1-row broadcast)
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    assert(!p.contains("CartesianProduct"), p.take(1000))
  }

  test("m38: seasonal profile partial-aggregates and broadcasts back onto the scan") {
    val p = plan("m38_seasonal")
    assert(p.contains("partial_count"), p.take(1000))
    assert(p.contains("BroadcastHashJoin"), p.take(1000))
    // the profile side must never shuffle-join the scan it came from
    assert(!p.contains("SortMergeJoin"), p.take(1000))
  }

  test("AQE splits a skewed sort-merge partition at runtime (the q39 complement)") {
    // the OTHER half of the skew story: where q39's explicit salt serves
    // plans AQE cannot rewrite, this pins that AQE's skew-join DOES fire
    // on the plain-join path we rely on elsewhere — a conf regression
    // (skewJoin.enabled off, thresholds raised) would silently bring the
    // one-task straggler back.
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = (0 until 20000).map(i =>
        (i.toLong, if (i % 10 != 0) 1L else (i % 97).toLong, "x" * 40))
        .toDF("id", "k", "pad")
      val dim = (0L until 97L).map(k => (k, s"d$k" + "y" * 40)).toDF("k", "attr")
      // no aggregate after the join: a downstream stage REQUIRING the
      // join's hash partitioning forbids the split (AQE preserves
      // required distributions), which is exactly q39's territory.
      // collect() — NOT a write, which executes a cloned QueryExecution
      // whose adaptive plan this Dataset's QE never sees finalized
      val joined = fact.join(dim, "k").select("id", "k", "attr")
      assert(joined.collect().length == 20000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE skew-join did not fire:\n${p.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("q39: salted join exchanges on (key, salt) and matches the plain join") {
    import spark.implicits._
    // honest skew: one hot key owns half the fact
    val fact = (0 until 400).map(i =>
      (i.toLong, if (i % 2 == 0) 1L else (i % 7).toLong, i * 1.0))
      .toDF("event_id", "k", "v")
    val dim = (0L until 7L).map(k => (k, s"seg$k")).toDF("k", "seg")
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // the operator targets dims past the broadcast threshold — model that
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val salted = graft.operators.SkewJoin
        .saltedJoin(fact, dim, Seq("k"), col("event_id"), salts = 4)
      val p = salted.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      // the exchange must carry the salt: the hot key's rows hash-spread
      // over (k, __salt) sub-partitions instead of one reducer task
      assert(p.linesIterator.exists(l =>
          l.contains("hashpartitioning(") && l.contains("__salt")),
        s"no (key, salt) exchange in:\n${p.take(1500)}")
      assert(!p.contains("BroadcastHashJoin"), p.take(1500))
      val got = salted.select("event_id", "k", "v", "seg")
        .as[(Long, Long, Double, String)].collect().sortBy(_._1)
      val want = fact.join(dim, "k").select("event_id", "k", "v", "seg")
        .as[(Long, Long, Double, String)].collect().sortBy(_._1)
      assert(got.toSeq === want.toSeq, "salting changed the join result")
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("ChaCha seal/open are codegen expressions — no UDF, inside WholeStageCodegen") {
    val key = ("0123456789abcdef" * 2).getBytes
    // range source (not a local literal — that would constant-fold the
    // whole projection into a LocalTableScan and leave nothing to pin)
    val df = spark.range(1)
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("payload-"),
        col("id").cast("string")).cast("binary").as("p"))
      .select(graft.functions.ChaChaOpen(
        graft.functions.ChaChaSeal(col("p"), key), key).as("rt"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("UDF"), s"cipher fell out of codegen:\n$p")
    // formatted mode marks codegen'd nodes with a "* " prefix
    assert(p.linesIterator.exists(l => l.trim.startsWith("* Project")),
      p.take(800))
    // and the computation is right through the codegen path
    assert(new String(df.head().getAs[Array[Byte]]("rt")) == "payload-0")
  }

  test("TopicKeyValidate is codegen — the subscribe plan stays whole-stage") {
    val rk = graft.model.TopicKey.generate("p.q", graft.model.TopicKey.AllowRead)
    val df = spark.range(1)
      .select(
        org.apache.spark.sql.functions.lit(rk).as("key"),
        org.apache.spark.sql.functions.lit("p.q").as("bare"),
        (col("id") + graft.model.Message.MasterContract).as("contract"))
      .select(graft.functions.TopicKeyValidate(
        col("key"), col("bare"), col("contract"),
        graft.model.TopicKey.AllowRead).as("ok"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("UDF"), p.take(800))
    assert(p.linesIterator.exists(l => l.trim.startsWith("* Project")),
      p.take(800))
    assert(df.head().getBoolean(0))
  }

  test("l63: pair algebra is array expressions over the minima arrays — no Window") {
    // the r17 shape computes every per-pair statistic (merged size,
    // shared minima, k-th hash) as per-row array expressions over the two
    // k-bounded minima lists; the r16 row/window tournament (a duplicated
    // row_number subtree + a SortMergeJoin against the per-pair sizes)
    // must not come back
    val p = plan("l63_kmv_setops")
    assert(!p.contains("Window"), s"pair-algebra window resurfaced:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"k-bounded pair frames must never sort-merge:\n${p.take(1500)}")
    val oha = p.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(oha >= 2, s"expected partial+final kmv_minima aggregate:\n${p.take(1500)}")
  }

  test("l64: count-min cells derive through the cm_cells kernel, one digest per token") {
    // the composed derivation (depth separate md5+substring+conv+pmod
    // trees per token) must not come back — it was the l64/m34 first-pass
    // CPU driver (4 string round-trips per token in generated code)
    val p = plan("l64_countmin")
    assert(p.contains("cm_cells"), s"cm_cells kernel missing:\n${p.take(1200)}")
    assert(!p.contains("md5("), s"composed md5 cell trees resurfaced:\n${p.take(1200)}")
    assert(!p.contains("conv("), s"conv radix round-trip resurfaced:\n${p.take(1200)}")
  }
}
