#!/usr/bin/env bash
# Two-cluster-size scaling evidence (BASELINE.md protocol): the same
# cascade job at local[8] and local[32] on identical input, fresh JVM
# per level, 1 warmup + 3 measured runs inside each JVM.
# Usage: tools/run_scaling.sh [nTurns] [outFile]
set -euo pipefail
TURNS="${1:-64000000}"
OUT="${2:-/tmp/scaling_results.jsonl}"
: > "$OUT"
for CORES in 32 8; do
  SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-40g}" \
    sbt -batch "runMain graft.ScalingBench $CORES $TURNS" 2>&1 |
    grep -oE '\{"cores".*' | tail -1 >> "$OUT"
done
python3 - "$OUT" <<'EOF'
import json, sys, statistics
rows = [json.loads(l) for l in open(sys.argv[1])]
by = {r["cores"]: r for r in rows}
t8 = statistics.median(by[8]["totals_sec"]) if 8 in by else None
t32 = statistics.median(by[32]["totals_sec"]) if 32 in by else None
if t8 and t32:
    speedup = t8 / t32
    eff = speedup / (32 / 8)
    turns = by[8]["turns"]
    print(f"turns={turns} t8={t8:.2f}s t32={t32:.2f}s speedup={speedup:.2f}x efficiency={eff:.2f}")
    for tier in ["raw_to_1m", "1m_to_1h", "1h_to_1d"]:
        m8 = statistics.median([r[tier]["sec"] for r in by[8]["runs"]])
        m32 = statistics.median([r[tier]["sec"] for r in by[32]["runs"]])
        inr = by[8]["runs"][0][tier]["in_rows"]
        print(f"  {tier}: in_rows={inr} 8c={m8:.2f}s ({inr/m8/1e6:.1f}M rows/s) "
              f"32c={m32:.2f}s ({inr/m32/1e6:.1f}M rows/s) eff={(m8/m32)/4:.2f}")
EOF
