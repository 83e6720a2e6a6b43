#!/bin/bash
# Same-hour interleaved A/B: HEAD (3-band re-cut) vs r3-end engine 509e579
# (judge's protocol, VERDICT r4 next #1): identical cached corpus, alternate
# invocations, min-of-clean decides. BENCH_DIAG=0 (e2e only).
set -u
OUT=/root/repo/BENCH/AB_r5_band.jsonl
: > "$OUT"
run() { # $1=label $2=dir $3=sfdir
  cd "$2" || exit 1
  line=$(SPARK_GRAFT_SF_DIR="$3" SPARK_GRAFT_CPUS=32 BENCH_DIAG=0 BENCH_REPEAT=3 \
    timeout 1800 python bench.py 2>/dev/null | tail -1)
  echo "{\"engine\": \"$1\", \"sf\": \"$(basename $3)\", \"bench\": $line}" >> "$OUT"
}
for i in 1 2; do
  run head /root/repo /root/testdata/sf0.1
  run r3   /root/repo/.wt_r3 /root/testdata/sf0.1
done
run head /root/repo /root/testdata/sf0.3
run r3   /root/repo/.wt_r3 /root/testdata/sf0.3
echo DONE >> "$OUT"
