#!/bin/bash
# Session-5 calm watcher: one sequential pass so the three measurements
# never contend with each other.  Waits for ONE calm probe (< 0.45 s —
# tighter than kernel_bench's own 0.5 s degraded threshold): calm windows
# on this host are real but short (probe floor 0.047 s observed earlier
# today vs 0.694 s over 56 probes this session), so the pre-gate is
# single-probe and the POST-run host_degraded checks veto any window
# that closed mid-run.  Then it records, in order:
#   1. kernel micro-bench  -> BENCH/KERNEL.json   (only if host_degraded=false)
#   2. headline suite      -> BENCH/local_r4_calm.json
#   3. scaling evidence    -> BENCH/SCALING.json + BASELINE.md section
#      (best-of-4 interleaved, 2.4 M clips — 2x the r3 input: this
#       round's kernel speedups shrank the parallel region at fixed
#       input, so the input grows to keep the measurement
#       steady-state-dominated, the regime the 10^12-row north rule
#       targets; only shipped if the run's own probes stayed calm)
set -u
cd /root/repo
THRESH=0.45
CALM_STREAK=0
echo "[watch-r4s5] started $(date -u +%H:%M:%SZ)"
while true; do
  P=$(python -c "
import numpy as np, time
a = np.random.rand(20_000_000)
t0 = time.perf_counter(); b = a * 1.5; t1 = time.perf_counter()
print(f'{t1-t0:.3f}')")
  echo "[watch-r4s5] $(date -u +%H:%M:%SZ) probe=${P}s streak=${CALM_STREAK}"
  if python -c "import sys; sys.exit(0 if float('${P}') < ${THRESH} else 1)"; then
    CALM_STREAK=$((CALM_STREAK + 1))
  else
    CALM_STREAK=0
  fi
  if [ "$CALM_STREAK" -lt 1 ]; then sleep 60; continue; fi

  echo "[watch-r4s5] calm confirmed — kernel bench"
  if python tools/kernel_bench.py > /tmp/kernel_r4s5.json 2>/tmp/kernel_r4s5.err; then
    DEG=$(python -c "import json; print(json.load(open('/tmp/kernel_r4s5.json'))['host_degraded'])")
    if [ "$DEG" = "False" ]; then
      cp /tmp/kernel_r4s5.json BENCH/KERNEL.json
      echo "[watch-r4s5] KERNEL.json refreshed (host_degraded=false)"
    else
      echo "[watch-r4s5] window degraded mid-run; kernel record NOT shipped"
      CALM_STREAK=0
      continue
    fi
  else
    echo "[watch-r4s5] kernel bench FAILED"; exit 1
  fi

  echo "[watch-r4s5] headline bench"
  if python bench.py > /tmp/bench_r4s5_raw.txt 2>/tmp/bench_r4s5.err \
     && tail -1 /tmp/bench_r4s5_raw.txt | python -c "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
    tail -1 /tmp/bench_r4s5_raw.txt > BENCH/local_r4_calm.json
    echo "[watch-r4s5] headline recorded:"; cat BENCH/local_r4_calm.json
  else
    echo "[watch-r4s5] headline bench FAILED"; exit 1
  fi

  echo "[watch-r4s5] scaling evidence (best-of-4, 2.4M clips)"
  if TSS_SCALING_CLIPS=2400000 TSS_SCALING_REPEATS=4 \
     python tools/bench_scaling.py > /tmp/scaling_r4s5.txt 2>/tmp/scaling_r4s5.err; then
    DEG=$(python -c "import json; print(json.load(open('BENCH/SCALING.json'))['host_degraded'])")
    echo "[watch-r4s5] scaling recorded (host_degraded=${DEG}):"
    tail -1 /tmp/scaling_r4s5.txt
    if [ "$DEG" = "True" ]; then
      echo "[watch-r4s5] window degraded mid-scaling; reverting SCALING record"
      git checkout BENCH/SCALING.json BENCH/BASELINE.md
      CALM_STREAK=0
      continue
    fi
    exit 0
  fi
  echo "[watch-r4s5] scaling bench FAILED"; exit 1
done
