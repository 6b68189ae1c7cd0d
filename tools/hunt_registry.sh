#!/bin/bash
# Registry-run hunt on a contended host (the same protocol the r13/r14
# clean artifacts used, scripted): pre-probe host steal, launch the full
# Bench registry only into a quiet window, and keep the first artifact
# whose own telemetry meets the clean bars (preflight+recheck PASS, zero
# failures, in-artifact steal below a wall-proportional cap). Bench
# writes bench_full.json in cwd — the committed artifact is backed up
# and restored around every attempt; winners land in /tmp for the
# builder to inspect and commit under a scale-specific name.
#
# usage: tools/hunt_registry.sh <sfDir> <driverMem> <tag> <maxAttempts> [stealCapSec]
#   e.g. tools/hunt_registry.sh .benchdata/sf10 32g x100 4 30
dir=$1; mem=$2; tag=$3; max=$4; cap=${5:-30}
cd "$(dirname "$0")/.."
i=0
refusals=0
while [ $i -lt $max ]; do
  # pre-probe refusals do NOT consume launch attempts — a stormy hour
  # should delay the hunt, not exhaust it (Bench's own preflight is the
  # second gate; this outer probe just avoids burning a ~1 h run into a
  # window that is visibly hopeless from the first 45 s). They DO have
  # a ceiling (ADVICE r14): an unattended hunt on a host with sustained
  # steal must terminate, not spin forever — 40 refusals ≈ 1.8 h of
  # probe+wait is long past any storm worth outlasting.
  s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 45; s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0))
  echo "[reg-$tag] $(date +%H:%M:%S) pre-probe steal delta/45s = $d jiffies (launches used: $i/$max, refusals: $refusals/40)"
  if [ "$d" -ge 60 ]; then
    refusals=$((refusals+1))
    if [ $refusals -ge 40 ]; then echo "[reg-$tag] GIVING UP: 40 consecutive contended pre-probes"; break; fi
    echo "[reg-$tag] very contended, waiting 120 s"; sleep 120; continue
  fi
  refusals=0
  i=$((i+1))
  cp bench_full.json /tmp/bf_backup_${tag}.json
  # a crashed sbt/Bench must leave NO artifact in cwd (ADVICE r14): the
  # committed/restored bench_full.json would otherwise be copied out and
  # judged CLEAN under the new tag — remove it so the parser's
  # DIRTY-no-artifact path fires on a crash, and gate on rc=0 too
  rm -f bench_full.json
  SPARK_DRIVER_MEM=$mem SPARK_GRAFT_SF_DIR=$dir SPARK_GRAFT_STORM_WAIT_SEC=900 \
    sbt -batch "runMain graft.Bench" > /tmp/bench_${tag}_$i.log 2>&1
  rc=$?
  rm -f /tmp/bench_${tag}_$i.json
  [ -f bench_full.json ] && [ $rc -eq 0 ] && cp bench_full.json /tmp/bench_${tag}_$i.json
  cp /tmp/bf_backup_${tag}.json bench_full.json
  verdict=$(python3 - /tmp/bench_${tag}_$i.json $cap <<'PYEOF'
import json,sys
try: d=json.load(open(sys.argv[1]))
except Exception as e: print(f"DIRTY no-artifact ({e})"); sys.exit()
cap=float(sys.argv[2])
steal=sum(d.get('host_steal_q',{}).values())
fails=d.get('failed',[])
pf=d.get('preflight',{})
ok=(not fails) and pf.get('pass') and pf.get('recheck',{}).get('pass') \
   and steal < cap and max(d.get('calib',[9])) <= 0.93
out=('CLEAN' if ok else 'DIRTY')+\
      f" total={d.get('value'):.1f}s steal={steal:.1f}s fails={len(fails)}"\
      f" calib={max(d.get('calib',[9])):.3f} bw={max(d.get('calib_bw',[9])):.3f}"\
      f" storm_wait={d.get('storm_wait_sec')}"\
      f" bw_convicted={len(d.get('bw_convicted',[]))}"
# density-NORMALIZED maintainer rates (ADVICE/VERDICT r14 #4): raw m37/m41
# walls across scale decades are incomparable because replicated testdata
# densifies the pair graph superlinearly — judge ns-per-wedge instead
for q in ('m37_incr_components','m41_incr_triangles'):
    den=d.get('density_q',{}).get(q); w=d.get('queries',{}).get(q)
    if den and w and den.get('wedges'):
        out+=f" {q.split('_')[0]}_ns_per_wedge={w*1e9/den['wedges']:.0f}"
print(out)
PYEOF
)
  echo "[reg-$tag] attempt $i: rc=$rc $verdict"
  case "$verdict" in CLEAN*) echo "[reg-$tag] KEEPING /tmp/bench_${tag}_$i.json"; break;; esac
  sleep 30
done
echo "[reg-$tag] done"
