#!/bin/bash
# Targeted scaling pair session: run the KG pipeline at an arbitrary
# list of core counts in ONE quiet window and report best-of tps per
# level plus every N-vs-4N efficiency the levels allow. Use when one
# level of a full session caught a bad noise window and needs a clean
# re-measure (round-4's 16c) without repaying the whole 5-level sweep.
# Usage: LEVELS="16:4 4:2" SCALE=xxbench OUT=/tmp/scaling_r5 bash tools/scaling_pair.sh
#   LEVELS = space-separated cpus:reps pairs, run in the given order.
set -u
SCALE=${SCALE:-xxbench}
OUT=${OUT:-/tmp/scaling_pair}
LEVELS=${LEVELS:-"16:4 4:2"}
mkdir -p "$OUT"
# absolutize before the cd below — a relative OUT would otherwise be
# created here but written to under the repo root
OUT=$(cd "$OUT" && pwd)
cd "$(dirname "$0")/.."
seg=0
for lvl in $LEVELS; do
  c=${lvl%%:*}; reps=${lvl##*:}
  # segment index in the filename: a LEVELS list that repeats a core
  # count (e.g. interleaved "16:1 4:1 16:1 ...") must not clobber the
  # earlier segment's rep files
  seg=$((seg + 1))
  for r in $(seq 1 "$reps"); do
    # route the whole-file record into the session dir — never the
    # committed BENCH/last_bench.json
    SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_KG_SCALE=$SCALE \
      SPARK_GRAFT_CPUS=$c \
      SPARK_GRAFT_BENCH_OUT="$OUT/c${c}_s${seg}_r${r}_full.json" \
      tools/run_class.sh -mem 16g -opts "-XX:+UseParallelGC -Xmn8g" graft.Bench 2>/dev/null |
      grep -E '^\{' > "$OUT/c${c}_s${seg}_r${r}.json"
    python3 - "$OUT/c${c}_s${seg}_r${r}.json" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
k = d["kg"]
print(f"{sys.argv[1]}: wall={k['wall_sec']:.1f}s tps={k['triples_per_sec']:.0f}", flush=True)
EOF
  done
done
python3 - "$OUT" <<'EOF'
import json, glob, sys, collections
out = sys.argv[1]
best = {}
walls = collections.defaultdict(list)
for f in glob.glob(f"{out}/c*_r*.json"):
    if f.endswith("_full.json"):
        continue
    c = int(f.split("/c")[1].split("_")[0])
    k = json.load(open(f))["kg"]
    walls[c].append((k["wall_sec"], k["triples_per_sec"]))
    best[c] = max(best.get(c, 0), k["triples_per_sec"])
for c in sorted(walls):
    ws = " / ".join(f"{w:.1f}" for w, _ in sorted(walls[c]))
    print(f"cpus={c}: walls {ws} | best tps {best[c]:.0f}")
for lo in sorted(best):
    hi = lo * 4
    if hi in best:
        print(f"eff({lo}->{hi}) = {(best[hi]/best[lo])/4:.3f}")
EOF
