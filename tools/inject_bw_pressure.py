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


def thrash(seconds: float, gate: str) -> None:
    buf = np.arange(64 << 20, dtype=np.int64)  # 512 MB
    if gate:
        # armed mode: buffers allocated, pressure held until the gate
        # file appears — onset is then ~instant, so a phase can be
        # dropped INSIDE a chosen query window (the ~5 s of per-worker
        # allocation otherwise smears the ramp across several windows)
        import os
        while not os.path.exists(gate):
            time.sleep(0.05)
    stop_at = time.time() + seconds
    view = buf[::8]
    while time.time() < stop_at:
        # stride 8 longs = one 64-byte line, read-MODIFY-write: each line
        # costs a read plus a writeback, twice the traffic of a pure
        # stream — a dozen read-only summers measurably don't saturate
        # this host's bus (walls inflate ~25% but the 0.12 s/GB kernel
        # barely moves); RMW workers do
        np.add(view, 1, out=view)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--wait-for", default="",
                    help="arm workers, thrash only once this file exists")
    a = ap.parse_args()
    ps = [multiprocessing.Process(target=thrash, args=(a.seconds, a.wait_for))
          for _ in range(a.workers)]
    for p in ps:
        p.start()
    print(f"[inject] {a.workers} workers "
          f"{'armed on ' + a.wait_for if a.wait_for else 'thrashing DRAM'} "
          f"for {a.seconds:.0f}s", flush=True)
    for p in ps:
        p.join()
    print("[inject] done", flush=True)


if __name__ == "__main__":
    main()
