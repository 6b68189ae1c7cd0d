#!/usr/bin/env python3
"""DRAM-pressure injector for validating Bench's bandwidth conviction
(VERDICT r14 #1 "done" criterion: an injected memory-pressure phase must
be machine-flagged on the affected queries, with the solo re-measure
triggered from the artifact, not from prose).

Spawns N workers, each strided-summing its own 512 MB buffer in a hot
loop — every access a cache-line-granularity DRAM transaction, the same
access pattern Bench's bw kernel measures, so the kernel's s/GB reading
rises roughly with the injected bus load. Runs for --seconds then exits
(or until killed). This reproduces the r14 closing-run signature
(queries ×3–4 wall, steal 0, cpu inflated) on demand.

Usage: python3 tools/inject_bw_pressure.py [--workers 8] [--seconds 60]
Dev tool only — never invoked by the engine or the bench itself.
"""
import argparse, multiprocessing, time
import numpy as np


def thrash(stop_at: float) -> None:
    buf = np.arange(64 << 20, dtype=np.int64)  # 512 MB
    s = 0
    while time.time() < stop_at:
        # stride 8 longs = one 64-byte line: pure bandwidth, no cache reuse
        s += int(buf[::8].sum())
    del s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=60.0)
    a = ap.parse_args()
    stop_at = time.time() + a.seconds
    ps = [multiprocessing.Process(target=thrash, args=(stop_at,))
          for _ in range(a.workers)]
    for p in ps:
        p.start()
    print(f"[inject] {a.workers} workers thrashing DRAM for {a.seconds:.0f}s",
          flush=True)
    for p in ps:
        p.join()
    print("[inject] done", flush=True)


if __name__ == "__main__":
    main()
