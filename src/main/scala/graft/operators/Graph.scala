package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph dataflow on plain DataFrames — the rounds-of-joins idiom
  * shared with [[graft.llm.TextDedup.dedupClusters]] (connected components):
  * a persisted, pre-partitioned edge frame, one shuffle join + one
  * partial-aggregated reduction per round, `localCheckpoint` truncating the
  * lineage so the plan never grows with iteration count. The reference has
  * no graph operators (its trie is a prefix index, not a graph —
  * `trie.go:163-188`); this module exists for the curation-pipeline side,
  * where link analysis ranks sources/hosts for crawl prioritization
  * (Page et al. 1999 — the original use case was exactly corpus curation).
  */
object Graph {

  /** PageRank in 10⁻¹² fixed point — every rank is a BIGINT number of
    * "picoranks", so all arithmetic is integer (exact, overflow-safe:
    * ranks ≤ 10¹², ×85 ≤ 8.5·10¹³) and every aggregation is ORDER-FREE.
    * That is what makes the result engine-identical and oracle-gateable:
    * float PageRank sums contributions in partition order, so no two runs
    * — let alone two engines — agree bit-for-bit; fixed point turns the
    * whole iteration into exact integer dataflow. (Production variants
    * that want IEEE doubles lose only the gate, not the plan — same
    * joins, same reductions.) The floor in each `div` leaks ≤ 1 picorank
    * per edge per round — bounded, deterministic, identical in both
    * engines.
    *
    * Model: r₀(v) = S div N; rₜ₊₁(v) = (15·S) div (100·N) +
    * Σ_{u→v} (85·rₜ(u)) div (100·outdeg(u)), damping 0.85, S = 10¹².
    * Dangling nodes are the CALLER's contract: every node must have at
    * least one out-edge (symmetrize the edge list for undirected graphs —
    * what [[graft.queries.AnalyticsQueries]] q38 does), because a rank
    * row whose node never appears as a source would need the dangling-
    * mass redistribution term, and a node with no IN-edges would need a
    * left join; requiring out∪in symmetry keeps every round one inner
    * join + one aggregate.
    *
    * Scale shape: `edges` is persisted and pre-partitioned on `src`, so
    * each round shuffles ONLY the rank frame (N rows) into the edge
    * partitioning, then one partial-aggregated sum by `dst` — per-round
    * cost is one |edges| join + one |edges|→N reduction, the same shape
    * GraphX/Pregel lowers to. Iterations are FIXED (`iters`), not
    * converged-on-a-float-epsilon: deterministic round count is both the
    * oracle contract and the production pattern (rank deltas at 8 rounds
    * are far inside any downstream consumer's tolerance).
    *
    * Input: (src, dst) string-keyed edge list (any key type works — keys
    * are only grouped/joined). Output: (node, rank_fp) — exact BIGINT
    * picoranks, ordered by node. */
  def pageRank(edges: DataFrame, iters: Int = 8): DataFrame = {
    require(iters >= 1, s"pageRank needs iters >= 1, got $iters")
    val e = edges.select("src", "dst").distinct()
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // edge list with its source's out-degree riding along: one join, done
    // once, cached — rounds never recompute it
    val ej = e.join(deg, "src")
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ej.count() // materialize before the rounds so e can be dropped early
    e.unpersist()
    val n = deg.agg(count(lit(1)).as("n")) // 1-row frame, broadcast below
    var ranks = deg.crossJoin(broadcast(n))
      .select(col("src").as("node"),
        expr("CAST(1000000000000 AS BIGINT) div n").as("r"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      i += 1
      ranks = ej.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(85 * r) div (100 * outdeg)")).as("contrib"))
        .crossJoin(broadcast(n))
        .select(col("node"),
          expr("(15 * CAST(1000000000000 AS BIGINT)) div (100 * n) + contrib")
            .as("r"))
        .localCheckpoint()
    }
    ej.unpersist()
    ranks.select(col("node"), col("r").as("rank_fp")).orderBy("node")
  }
}
