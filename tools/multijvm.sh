#!/bin/bash
# Scale-out attribution experiment (BASELINE.md scaling section): run 4
# INDEPENDENT 8-core JVMs concurrently over disjoint url-hash quarters
# of the input vs one 8-core JVM over the full input. Each JVM brings
# its own heap/young gen, so if aggregate 4x8c tps ~= 4x the single-8c
# tps, the >16-thread bend of the single-JVM curve is shared-JVM/GC,
# not engine plan shape; any shortfall that remains is the shared
# socket (DRAM bandwidth / LLC), which a real multi-executor cluster
# also multiplies.
# Usage: REPS=3 SCALE=xxbench bash tools/multijvm.sh
set -u
REPS=${REPS:-3}
SCALE=${SCALE:-xxbench}
cd "$(dirname "$0")/.."
if [ ! -f "/tmp/graft-input-$SCALE/same_as/_SUCCESS" ]; then
  echo "generating /tmp/graft-input-$SCALE ..."
  SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_KG_SCALE=$SCALE SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT="/tmp/multijvm_gen.json" \
    tools/run_class.sh -mem 16g -opts "-XX:+UseParallelGC -Xmn8g" graft.Bench \
    >/dev/null 2>&1
fi
for r in $(seq 1 "$REPS"); do
  pids=()
  for q in 0 1 2 3; do
    lo=$((q * 4)); hi=$((q * 4 + 3))
    SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_KG_SCALE=$SCALE SPARK_GRAFT_CPUS=8 \
      SPARK_GRAFT_BUCKETS="$lo-$hi" \
      SPARK_GRAFT_BENCH_OUT="/tmp/multijvm_${r}_q${q}_full.json" \
      tools/run_class.sh -mem 16g -opts "-XX:+UseParallelGC -Xmn8g" graft.Bench \
      2>/dev/null | grep -E '^\{' > "/tmp/multijvm_${r}_q${q}.json" &
    pids+=($!)
  done
  for p in "${pids[@]}"; do wait "$p"; done
  python3 - "$r" <<'EOF'
import json, sys, os
r = sys.argv[1]
tot_a, walls = 0, []
for q in range(4):
    f = f"/tmp/multijvm_{r}_q{q}.json"
    # a crashed/OOM'd JVM leaves an empty file (stderr is discarded):
    # name the failed quarter instead of dying on a JSONDecodeError
    if not os.path.exists(f) or os.path.getsize(f) == 0:
        print(f"  rep={r} q={q} FAILED (empty {f}) — rep aggregate invalid")
        continue
    d = json.load(open(f))["kg"]
    tot_a += d["assertions"]; walls.append(d["wall_sec"])
    print(f"  rep={r} q={q} assertions={d['assertions']} "
          f"wall={d['wall_sec']:.1f}s tps={d['triples_per_sec']:.0f}")
if walls:
    print(f"rep={r} AGGREGATE assertions={tot_a} max_wall={max(walls):.1f}s "
          f"agg_tps={tot_a/max(walls):.0f}")
EOF
done
