#!/usr/bin/env python3
"""Assemble bench_x1000_full.json from the r16 cast's two sources.

The full-registry x1000 cast ran as one hunt attempt that timed 143
queries (including every family the x100 cast could not prove at this
decade: the sketch gates post-fix, the contracted l22, m37) before the
power-iteration graph family — measured at ~19 min PER QUERY by its
first member, q38_pagerank (1128 s, 29.9k CPU-s) — would have pushed
the run past the session budget.  The run was stopped at the q38/q38b
boundary and the remaining NON-graph tail (16 queries: the q39..q9
relational block and the s-engine family) was timed in a second,
explicit-args Bench invocation on the same data and host.

This script merges:
  1. per-query `[bench] window <name> wall=.. cpu=.. steal=.. bw=..`
     rows from the first run's log (a repeated name is the bw-conviction
     machinery's clean re-run; the min-wall rule selects it, the same
     rule every x1000 row uses — recorded per row as `rule`),
  2. the tail run's bench_full.json artifact (min of first wall and any
     conviction re-run, same rule),
and prices the nine untimed power-iteration/wedge twins from their x100
walls scaled by q38's MEASURED fourth-decade ratio (the one family
member that was timed at x1000) — recorded under `priced_not_timed`,
never mixed into the timed totals.

A tail artifact's `failed` names are skipped (the first tail run lost
three queries to an ENOSPC from the killed first run's orphaned shuffle
dirs; they were re-run solo in a second tail artifact after the sweep).

usage: tools/assemble_x1000_full.py <run1.log> <x100.json> <out.json> <tail.json>...
"""
import json
import re
import sys

run1_log, x100_json, out_json = sys.argv[1:4]
tail_jsons = sys.argv[4:]

ROW = re.compile(
    r"\[bench\] window (\S+) wall=([\d.]+) cpu=([\d.]+) steal=([\d.]+) bw=([\d.]+)")
DENS = re.compile(
    r"\[bench\] (\S+) input density: edges=(\d+) wedges=(\d+)")

rows = {}
density = {}
for line in open(run1_log, errors="replace"):
    m = ROW.search(line)
    if m:
        name, wall, cpu, steal, bw = m.group(1), *map(float, m.groups()[1:])
        rows.setdefault(name, []).append(
            {"wall": wall, "cpu": cpu, "steal": steal, "bw": bw})
    d = DENS.search(line)
    if d:
        density[d.group(1)] = {"edges": int(d.group(2)), "wedges": int(d.group(3))}

x100 = json.load(open(x100_json))

queries, cpu_q, steal_q, bw_q, rule_q, rerun_q = {}, {}, {}, {}, {}, {}

for name, rs in sorted(rows.items()):
    best = min(rs, key=lambda r: r["wall"])
    queries[name] = best["wall"]
    cpu_q[name] = best["cpu"]
    steal_q[name] = best["steal"]
    bw_q[name] = best["bw"]
    rule_q[name] = "min-wall"
    if len(rs) > 1:
        rerun_q[name] = rs

tails = [json.load(open(p)) for p in tail_jsons]
for tail in tails:
    tail_rerun = tail.get("rerun_q") or {}
    failed = set(tail.get("failed") or [])
    for name, wall in tail["queries"].items():
        if name in failed:
            continue
        rr = tail_rerun.get(name)
        cand = [{"wall": wall, "cpu": tail["cpu_q"][name],
                 "steal": tail.get("host_steal_q", {}).get(name, 0.0),
                 "bw": tail.get("bw_q", {}).get(name, 0.0)}]
        if rr:
            cand.append({"wall": rr["rerun"]["wall"], "cpu": rr["rerun"]["cpu"],
                         "steal": rr["rerun"]["steal"], "bw": rr["rerun"]["bw"]})
            rerun_q[name] = cand
        best = min(cand, key=lambda r: r["wall"])
        queries[name] = best["wall"]
        cpu_q[name] = best["cpu"]
        steal_q[name] = best["steal"]
        bw_q[name] = best["bw"]
        rule_q[name] = "min-wall"

# the nine untimed power-iteration/wedge twins: priced, never timed
GRAPH_UNTIMED = ["q38b_pagerank_distpath", "q40_triangles",
                 "q40b_triangles_distpath", "q41_ppr", "q41b_ppr_distpath",
                 "q42_hits", "q42b_hits_distpath", "q43_weighted_pagerank",
                 "q43b_weighted_distpath"]
exemplar = "q38_pagerank"
ratio = queries[exemplar] / x100["queries"][exemplar]
priced = {name: {"x100_wall": x100["queries"][name],
                 "x1000_priced": round(x100["queries"][name] * ratio, 1)}
          for name in GRAPH_UNTIMED}

out = {
    "metric": "total",
    "value": round(sum(queries.values()), 2),
    "unit": "sec",
    "queries": queries,
    "sf": "/root/repo/.benchdata/sf100",
    "cpus": 32,
    "excluded": ["l2_neardup_minhash", "l7_simhash_neardup", "l9_embdup_lsh",
                 "l12_ngram_jaccard", "l20_winnow_overlap",
                 "l40_paraphrase_pairs", "l43_containment",
                 "l57_media_neardup", "m41_incr_triangles"],
    "excluded_n": 9,
    "second_pass": False,
    "cpu_q": cpu_q,
    "host_steal_q": steal_q,
    "bw_q": bw_q,
    "rule_q": rule_q,
    "rerun_q": rerun_q,
    "density_q": density,
    "priced_not_timed": {
        "names": GRAPH_UNTIMED,
        "exemplar": exemplar,
        "exemplar_x1000_wall": queries[exemplar],
        "exemplar_x100_wall": x100["queries"][exemplar],
        "fourth_decade_ratio": round(ratio, 2),
        "rows": priced,
        "why": "power-iteration/wedge family at ~19 min/query would not "
               "fit the session; q38 is the family's timed x1000 exemplar",
    },
    "assembled": {
        "sources": [
            {"kind": "run1-log", "queries": len(rows),
             "note": "full argless cast, stopped at the q38/q38b boundary"},
        ] + [
            {"kind": "tail-artifact", "path": p,
             "queries": len(t["queries"]) - len(t.get("failed") or []),
             "failed_skipped": t.get("failed") or [],
             "note": "explicit-args Bench on the same data/host"}
            for p, t in zip(tail_jsons, tails)
        ],
        "rule": "min-wall",
    },
}
json.dump(out, open(out_json, "w"), indent=1)
print(f"assembled {len(queries)} timed + {len(GRAPH_UNTIMED)} priced; "
      f"total {out['value']:.1f} s; reruns {len(rerun_q)}")
