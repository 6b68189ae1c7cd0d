#!/usr/bin/env python3
"""l68 bound-parity check (ADVICE r14): at every driver SF all vec_ids sit
below EvalIdBound, so the oracle gate never exercises the id >= bound leg
of the l68 SQL predicate — engine-vs-DuckDB parity for the bound itself was
proven only on the engine side (ResampleSpec). This script builds a tiny
synthetic embeddings table whose ids STRADDLE the bound (eval-shaped ids
below it, eval-SHAPED-but-corpus ids at/above it, a zero vector, a tie),
dumps the engine's l68 output via graft.Verify, and cross-checks it against
the committed oracle SQL in DuckDB via tools/check_oracle.py — the same
compare the driver runs. A future drift in the SQL predicate (e.g. the
NOT(...) negation) now fails HERE instead of passing the gate silently.

Usage: python3 tools/check_l68_bound.py        (from the repo root)
Dev tool only — the engine itself never calls this.
"""
import os, subprocess, sys
import pyarrow as pa
import pyarrow.parquet as pq

BOUND = 100_000_000  # graft.llm.Similarity.EvalIdBound

SRC = "/tmp/l68_bound_src"
OUT = "/tmp/l68_bound_out"

rows = [
    # (vec_id, embedding) — eval set = id % 50 == 0 AND id < BOUND
    (0,             [1.0, 0.0, 0.0]),   # eval
    (50,            [0.0, 1.0, 0.0]),   # eval
    (BOUND - 50,    [0.5, 0.5, 0.0]),   # eval (just under the bound)
    (123,           [2.0, 0.0, 0.0]),   # corpus: dup of eval 0 -> flags
    (201,           [0.0, 0.0, 1.0]),   # corpus: orthogonal -> clean
    (301,           [0.0, 0.0, 0.0]),   # corpus: zero vector -> NULL max_cos
    (BOUND,         [3.0, 0.0, 0.0]),   # % 50 == 0 but AT the bound: CORPUS, flags vs 0
    (BOUND + 50,    [0.0, 4.0, 0.0]),   # same shape above the bound: CORPUS, flags vs 50
    (BOUND + 7,     [1.0, 1.0, 0.0]),   # corpus: ties eval 0 and 50 at 1/sqrt(2),
                                        # argmax tiebreak -> bench_id 0
]

def main():
    os.makedirs(SRC, exist_ok=True)
    t = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    })
    pq.write_table(t, os.path.join(SRC, "embeddings.parquet"))
    print(f"[l68-bound] wrote {len(rows)} rows straddling {BOUND} to {SRC}")
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SRC} {OUT} l68_semantic_decontam"],
        check=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "check_oracle.py"),
         SRC, OUT, "l68_semantic_decontam"]).returncode
    sys.exit(rc)

if __name__ == "__main__":
    main()
