#!/bin/bash
# Assembly hunt for StreamScaleProbe on a contended host (see
# BENCH_SCALE.md §r14): run the probe repeatedly; every face's JSON line
# carries its own host_steal bracket, so each attempt contributes
# whichever faces ran quiet, and the hunt stops when every face has a
# clean (< 2 s in-window steal) row. The committed stream_probe.json is
# restored after every attempt; assemble the winners from the pool with
# min-steal per face.
#
# usage: tools/hunt_faces.sh <scaleDir> <driverMem> <tag> <maxAttempts>
#   e.g. tools/hunt_faces.sh .benchdata/sf10 32g x100 8
dir=$1; mem=$2; tag=$3; max=$4
pool=/tmp/facepool_${tag}.jsonl
: > $pool
cd "$(dirname "$0")/.."
# the pinned slice layout (~1.6 GB at x1000) is reused ACROSS this hunt's
# attempts but has no self-clean of its own (ADVICE r15: layouts
# accumulated per tag on a disk the round already ENOSPC-killed once) —
# sweep it when the hunt exits, however it exits
trap 'rm -rf /tmp/graft_slices_${tag}' EXIT
for i in $(seq 1 $max); do
  s0=$(awk '/^cpu /{print $9}' /proc/stat); sleep 45; s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0))
  echo "[faces-$tag] $(date +%H:%M:%S) attempt $i pre-probe steal delta/45s = $d jiffies"
  if [ "$d" -ge 60 ]; then echo "[faces-$tag] very contended, waiting 90 s"; sleep 90; continue; fi
  cp stream_probe.json /tmp/sp_backup_${tag}.json
  # stale scratch from storm-killed attempts is ~25 GB each at x1000 and
  # ENOSPC-killed a run mid-hunt (r15); finished probes self-clean, but
  # killed ones can't — sweep before every launch. Scoped to dirs with
  # NO file written in 30 min anywhere inside (ADVICE r15: a blanket
  # rm -rf killed the live checkpoint / RocksDB dirs of any CONCURRENT
  # probe under a different tag — a live probe's micro-batches write
  # state far more often than every 30 min, while this hunt's own killed
  # attempt only waits one sweep cycle to be reclaimed).
  for d in /tmp/graft_sprobe*; do
    [ -d "$d" ] || continue
    [ -z "$(find "$d" -mmin -30 -print -quit 2>/dev/null)" ] && rm -rf "$d"
  done
  SPARK_GRAFT_PROBE_SLICES_DIR=/tmp/graft_slices_${tag} SPARK_DRIVER_MEM=$mem \
    sbt -batch "runMain graft.StreamScaleProbe $dir" \
    > /tmp/sprobeF_${tag}_$i.log 2>&1
  rc=$?
  cp /tmp/sp_backup_${tag}.json stream_probe.json
  # r15's outputStrategy := StdoutOutput dropped sbt's "[info] " prefix
  # from forked stdout — accept both forms so old logs stay parseable
  grep -hE '^(\[info\] )?\{"q"' /tmp/sprobeF_${tag}_$i.log | sed 's/^\[info\] //' >> $pool
  missing=$(python3 - "$pool" <<'PYEOF'
import json,sys
want={'m13_session','m40_dyn_session','m14_dedup','m17_join_inner','m21_join_outer','m30_join_semi','m31_join_full','m18_profile_state'}
clean=set()
for ln in open(sys.argv[1]):
    try: d=json.loads(ln)
    except: continue
    if d.get('q') in want and 0 <= d.get('host_steal',99) < 2.0:
        clean.add(d['q'])
print(','.join(sorted(want-clean)) or 'NONE')
PYEOF
)
  echo "[faces-$tag] attempt $i: rc=$rc still-missing: $missing"
  if [ "$missing" = "NONE" ]; then echo "[faces-$tag] ALL FACES CLEAN"; break; fi
  sleep 20
done
# rule-stamped winners (VERDICT r15 #5): every selected row carries
# "rule":"min-steal"|"min-wall" and the cap, so cross-decade tooling can
# see which selection regime produced it instead of inferring from lore
echo "[faces-$tag] done — rule-stamped winners (append to stream_probe.json):"
python3 tools/assemble_probe.py faces $pool --cap 2.0
