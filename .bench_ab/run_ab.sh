#!/bin/bash
# Interleaved A/B: r02-close (74c0823) vs r04 HEAD, same host window, sf0.1 local[32]
set -u
OUT=/root/repo/.bench_ab
for i in 1 2 3; do
  for side in r02 head; do
    if [ "$side" = r02 ]; then DIR=/tmp/r02tree; else DIR=/root/repo; fi
    cd "$DIR"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      timeout 600 python bench.py 2>/dev/null | grep '^{' | tail -1 > "$OUT/${side}_$i.json"
    echo "done ${side}_$i $(date +%T)"
  done
done
