#!/bin/bash
# Round-6 A/B protocol: isolated fresh-JVM QueryBench per query group,
# before tree (/tmp/graft_before @ aa3d665) vs after tree (/root/repo),
# sf0.1, local[32], 3 runs per query (min+median printed). Output one
# JSON line per (tree, group) to bench_evidence/r06_ab.jsonl.
set -u
SF=/root/testdata/sf0.1
OUT=/root/repo/bench_evidence/r06_ab.jsonl
QGROUPS=(
  "q_minhash_lsh,q_simhash_neardups,q_substring_dups"
  "q_dedup_clusters,q_dedup_select"
  "q_gapfill_locf,q_gapfill_interp"
  "q_neardup_verified,q_embed_clusters"
  "q_tier_merge"
  "q_streaming_rollup"
)
for tree in "$@"; do
  case $tree in
    before) DIR=/tmp/graft_before;;
    after)  DIR=/root/repo;;
    *) echo "usage: r06_ab.sh before|after..."; exit 1;;
  esac
  for g in "${QGROUPS[@]}"; do
    echo "== $tree $g =="
    line=$(cd "$DIR" && SPARK_GRAFT_CPUS=32 timeout 1200 sbt -batch \
      "runMain graft.QueryBench $SF $g 3" 2>/dev/null | grep -F '"min"' | sed 's/^\[info\] //')
    echo "{\"tree\":\"$tree\",\"group\":\"$g\",\"res\":$line}" | tee -a "$OUT"
  done
done
