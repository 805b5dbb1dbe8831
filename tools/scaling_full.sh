#!/bin/bash
# One-session scaling record (round-4 protocol): the SAME KG pipeline
# job on the SAME pre-materialized xxbench input at 2/4/8/16/32 cores,
# all reps in one quiet window so the record is a single-binary,
# single-session table (the r3 record mixed r2 best-ofs with one r3
# confirmation rep). Reps per level weighted by noise sensitivity:
# long runs (2c/4c) are noise-steady, short ones need more reps.
set -u
SCALE=${SCALE:-xxbench}
OUT=${OUT:-/tmp/scaling_r4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
run_level() {
  local c=$1 reps=$2 r
  for r in $(seq 1 "$reps"); do
    # route the whole-file record into the session dir — without this,
    # every rep would clobber the committed BENCH/last_bench.json with a
    # KG-only blob
    SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_KG_SCALE=$SCALE \
      SPARK_GRAFT_CPUS=$c \
      SPARK_GRAFT_BENCH_OUT="$OUT/c${c}_r${r}_full.json" \
      tools/run_class.sh -mem 16g -opts "-XX:+UseParallelGC -Xmn8g" graft.Bench 2>/dev/null |
      grep -E '^\{' > "$OUT/c${c}_r${r}.json"
    python3 - "$OUT/c${c}_r${r}.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
k = d["kg"]
print(f"{sys.argv[1]}: wall={k['wall_sec']:.1f}s tps={k['triples_per_sec']:.0f}", flush=True)
EOF
  done
}
# order: most-load-bearing short levels first
run_level 32 5
run_level 8 5
run_level 16 3
run_level 4 2
run_level 2 2
python3 - "$OUT" <<'EOF'
import json, glob, sys, collections
out = sys.argv[1]
best = {}
walls = collections.defaultdict(list)
for f in glob.glob(f"{out}/c*_r*.json"):
    c = int(f.split("/c")[1].split("_")[0])
    k = json.load(open(f))["kg"]
    walls[c].append((k["wall_sec"], k["triples_per_sec"]))
    best[c] = max(best.get(c, 0), k["triples_per_sec"])
for c in sorted(walls):
    ws = " / ".join(f"{w:.1f}" for w, _ in sorted(walls[c]))
    print(f"cpus={c}: walls {ws} | best tps {best[c]:.0f}")
for lo, hi in ((2, 8), (4, 16), (8, 32)):
    if lo in best and hi in best:
        print(f"eff({lo}->{hi}) = {(best[hi]/best[lo])/4:.3f}")
EOF
