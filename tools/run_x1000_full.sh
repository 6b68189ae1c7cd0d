#!/bin/bash
# Full-registry ×1000 cast (VERDICT r15 #1): the whole registry at
# ScaleData ×1000 (.benchdata/sf100) minus the two families that cannot
# be timed meaningfully at this decade — recorded IN the artifact via
# SPARK_GRAFT_EXCLUDE (no silent caps):
#   - the l2-style near-dup PAIR queries, whose OUTPUT is quadratic in
#     replica depth by construction (every base near-dup group of size g
#     becomes 1000g identical docs → ~g²·10⁶/2 answer rows; no plan makes
#     the answer itself linear);
#   - m41, whose wedge workload grows ~×1000/decade on replicated data
#     (wedges ∝ F³ per identical-doc clique) — priced instead from a
#     MEASURED ×1000 input density (graft.DensityProbe) × the ×100 run's
#     per-wedge rate (BENCH_SCALE §r16).
# The r10 suspect-cluster second pass is off (SPARK_GRAFT_SECOND_PASS=0,
# recorded in the artifact): it would re-time m37's multi-hundred-second
# wall for phase-conviction value the per-query steal/bw brackets already
# provide at this decade.
#
# usage: tools/run_x1000_full.sh [maxAttempts] [stealCapSec]
cd "$(dirname "$0")/.."
export SPARK_GRAFT_EXCLUDE=l2_neardup_minhash,l7_simhash_neardup,l9_embdup_lsh,l12_ngram_jaccard,l20_winnow_overlap,l40_paraphrase_pairs,l43_containment,l57_media_neardup,m41_incr_triangles
export SPARK_GRAFT_SECOND_PASS=0
# (storm-wait budget: hunt_registry.sh pins 900 s on the launch line)
tools/hunt_registry.sh /root/repo/.benchdata/sf100 48g x1000full "${1:-1}" "${2:-150}"
