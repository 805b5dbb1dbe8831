#!/bin/bash
# Scaling-efficiency measurement (BASELINE.md protocol): run the KG
# pipeline benchmark at local[8] and local[32], best-of-N per level to
# shed host-VM noise, and print the efficiency.
set -u
REPS=${REPS:-5}
SCALE=${SCALE:-xxbench}
cd "$(dirname "$0")/.."
for c in 8 32; do
  for r in $(seq 1 "$REPS"); do
    # 16g heap, 8g FIXED young gen + ParallelGC: a large young gen's
    # collections pause for seconds and dominate wall time (measured:
    # -Xmn18g took text-extract from 26s to 56s); an unpinned young gen
    # shrinks under promotion pressure and collects too often. Direct
    # java (tools/run_class.sh) avoids the sbt lock + startup.
    SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_KG_SCALE=$SCALE \
      SPARK_GRAFT_CPUS=$c \
      tools/run_class.sh -mem 16g -opts "-XX:+UseParallelGC -Xmn8g" graft.Bench 2>/dev/null |
      grep -E '^\{' \
      > "/tmp/scaling_${c}_${r}.json"
    python3 - "$c" "$r" <<'EOF'
import json, sys
c, r = sys.argv[1], sys.argv[2]
d = json.load(open(f"/tmp/scaling_{c}_{r}.json"))
k = d["kg"]
print(f"cpus={c} rep={r} wall={k['wall_sec']:.1f}s tps={k['triples_per_sec']:.0f}")
EOF
  done
done
python3 - <<EOF
import json, glob
best = {}
for c in (8, 32):
    tps = []
    for f in glob.glob(f"/tmp/scaling_{c}_*.json"):
        tps.append(json.load(open(f))["kg"]["triples_per_sec"])
    best[c] = max(tps)
eff = (best[32] / best[8]) / 4
print(f"BEST: tps8={best[8]:.0f} tps32={best[32]:.0f} efficiency={eff:.3f}")
EOF
