#!/usr/bin/env bash
# Window/join-family two-cores-level scaling (round-4 ops): the same
# five jobs (asof_join, range_join, sessions, ewma, pack) at N and 4N
# cores on byte-identical staged inputs. Same hygiene as
# run_scaling.sh: staging in a separate JVM + sync, page cache primed
# before EVERY level, fresh JVM per level, 1 warmup + 3 runs.
# Usage: tools/run_window_scaling.sh [nTurns] [N] [outFile]
set -euo pipefail
TURNS="${1:-16000000}"
N="${2:-8}"
OUT="${3:-/tmp/window_scaling.jsonl}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-40g}"
: > "$OUT"
sbt -batch "runMain graft.WindowBench 32 $TURNS materialize" >/dev/null 2>&1
sync; sleep 5
for CORES in $((N * 4)) "$N"; do
  cat /tmp/graft_wb_"$TURNS"/*/*.parquet > /dev/null 2>&1 || true
  sbt -batch "runMain graft.WindowBench $CORES $TURNS" 2>&1 |
    grep -oE '\{"cores".*' | tail -1 >> "$OUT"
  sync; sleep 5
done
python3 - "$OUT" <<'EOF'
import json, sys, statistics
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {}
for r in rows:
    by.setdefault(r["cores"], []).append(r)
lo, hi = min(by), max(by)
def runs(c): return [run for r in by[c] for run in r["runs"]]
OPS = list(runs(lo)[0].keys())
inr = by[lo][0]["in_rows"]
print(f"turns={by[lo][0]['turns']} pts={inr['pts']} docs={inr['docs']} "
      f"executions={len(by[lo])}")
for op in OPS:
    n = inr["docs"] if op == "pack" else inr["pts"]
    ml = statistics.median([run[op] for run in runs(lo)])
    mh = statistics.median([run[op] for run in runs(hi)])
    print(f"  {op}: in={n} {lo}c={ml:.2f}s ({n/ml/1e6:.1f}M/s) "
          f"{hi}c={mh:.2f}s ({n/mh/1e6:.1f}M/s) eff={(ml/mh)/(hi/lo):.2f}")
# min-combined estimator (interference strictly adds time)
nl = sum(min(run[op] for run in runs(lo)) for op in OPS)
nh = sum(min(run[op] for run in runs(hi)) for op in OPS)
print(f"  min-combined: t{lo}={nl:.2f}s t{hi}={nh:.2f}s "
      f"efficiency={(nl/nh)/(hi/lo):.3f}")
EOF
