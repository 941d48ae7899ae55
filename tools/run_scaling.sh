#!/usr/bin/env bash
# Two-cluster-size scaling evidence (BASELINE.md protocol): the same
# zero-shuffle cascade at N and 4N cores on identical bucketed input.
# Fresh JVM per level; inputs materialized by a separate JVM + sync so
# writeback never contaminates measured runs; 1 warmup + 3 runs per
# level (median reported).
# Usage: tools/run_scaling.sh [nTurns] [N] [outFile]   (levels N and 4N)
set -euo pipefail
TURNS="${1:-64000000}"
N="${2:-2}"
OUT="${3:-/tmp/scaling_results.jsonl}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-40g}"
: > "$OUT"
sbt -batch "runMain graft.ScalingBench 32 $TURNS materialize" >/dev/null 2>&1
sync; sleep 5
for CORES in $((N * 4)) "$N"; do
  # prime the page cache identically before EVERY level: the first
  # level otherwise reads cold files while later levels read warm ones
  # (measured 27% on the 8-core level), biasing efficiency toward
  # whichever level runs second.
  cat /tmp/graft_bkt_"$TURNS"/turns/*.parquet \
      /tmp/graft_bkt_"$TURNS"/m1/*.parquet \
      /tmp/graft_bkt_"$TURNS"/h1/*.parquet > /dev/null 2>&1 || true
  sbt -batch "runMain graft.ScalingBench $CORES $TURNS bucketed" 2>&1 |
    grep -oE '\{"cores".*' | tail -1 >> "$OUT"
  sync; sleep 5
done
python3 - "$OUT" <<'EOF'
import json, sys, statistics
rows = [json.loads(l) for l in open(sys.argv[1])]
# GROUP per cores level (a dict comprehension would keep only the last
# execution) — this file may be the concatenation of several protocol
# executions, and every aggregate below must cover ALL of their runs.
by = {}
for r in rows:
    by.setdefault(r["cores"], []).append(r)
lo, hi = min(by), max(by)
TIERS = ["raw_to_1m", "1m_to_1h", "1h_to_1d"]
def runs(c): return [run for r in by[c] for run in r["runs"]]
tl = statistics.median([t for r in by[lo] for t in r["totals_sec"]])
th = statistics.median([t for r in by[hi] for t in r["totals_sec"]])
n_ex = len(by[lo])
print(f"turns={by[lo][0]['turns']} executions={n_ex} "
      f"t{lo}={tl:.2f}s t{hi}={th:.2f}s "
      f"speedup={tl/th:.2f}x efficiency={(tl/th)/(hi/lo):.3f}")
for tier in TIERS:
    ml = statistics.median([run[tier]["sec"] for run in runs(lo)])
    mh = statistics.median([run[tier]["sec"] for run in runs(hi)])
    inr = runs(lo)[0][tier]["in_rows"]
    print(f"  {tier}: in={inr} {lo}c={ml:.2f}s ({inr/ml/1e6:.1f}M/s) "
          f"{hi}c={mh:.2f}s ({inr/mh/1e6:.1f}M/s) eff={(ml/mh)/(hi/lo):.2f}")
# min-combined estimator: interference on a shared box strictly ADDS
# time, so per-tier minima across ALL runs (of all executions in the
# file) reject it; on noisy days this is the stable signal
# (BENCH.md round-3 note).
nl = sum(min(run[t]["sec"] for run in runs(lo)) for t in TIERS)
nh = sum(min(run[t]["sec"] for run in runs(hi)) for t in TIERS)
print(f"  min-combined ({len(runs(lo))} runs/level): "
      f"t{lo}={nl:.2f}s t{hi}={nh:.2f}s efficiency={(nl/nh)/(hi/lo):.3f}")
EOF
