#!/bin/bash
# Diagnostic interleaved A/B at sf0.3 with per-stage timings, alternating
# engine order to cancel warm-cache bias.
set -u
OUT=/root/repo/BENCH/AB_r5_band_diag.jsonl
: > "$OUT"
run() {
  cd "$2" || exit 1
  line=$(SPARK_GRAFT_SF_DIR=/root/testdata/sf0.3 SPARK_GRAFT_CPUS=32 BENCH_DIAG=1 BENCH_REPEAT=3 \
    timeout 1800 python bench.py 2>/dev/null | tail -1)
  echo "{\"engine\": \"$1\", \"bench\": $line}" >> "$OUT"
}
run r3   /root/repo/.wt_r3
run head /root/repo
run head /root/repo
run r3   /root/repo/.wt_r3
echo DONE >> "$OUT"
