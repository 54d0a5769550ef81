#!/bin/bash
# Session-4 calm watcher: tighter threshold (0.45) than the round-3
# watcher so the kernel record lands with host_degraded=false (the
# kernel_bench flag trips at probe > 0.5).  Runs the kernel micro-bench
# first; only overwrites BENCH/KERNEL.json if the post-run probe stayed
# calm.  Then the headline suite, recorded separately.
set -u
cd /root/repo
THRESH=0.45
CALM_STREAK=0
echo "[watch-r4s4] started $(date -u +%H:%M:%SZ)"
while true; do
  P=$(python -c "
import numpy as np, time
a = np.random.rand(20_000_000)
t0 = time.perf_counter(); b = a * 1.5; t1 = time.perf_counter()
print(f'{t1-t0:.3f}')")
  echo "[watch-r4s4] $(date -u +%H:%M:%SZ) probe=${P}s streak=${CALM_STREAK}"
  if python -c "import sys; sys.exit(0 if float('${P}') < ${THRESH} else 1)"; then
    CALM_STREAK=$((CALM_STREAK + 1))
  else
    CALM_STREAK=0
  fi
  if [ "$CALM_STREAK" -ge 2 ]; then
    echo "[watch-r4s4] calm confirmed — kernel bench"
    if python tools/kernel_bench.py > /tmp/kernel_r4s4.json 2>/tmp/kernel_r4s4.err; then
      DEG=$(python -c "import json; print(json.load(open('/tmp/kernel_r4s4.json'))['host_degraded'])")
      if [ "$DEG" = "False" ]; then
        cp /tmp/kernel_r4s4.json BENCH/KERNEL.json
        echo "[watch-r4s4] KERNEL.json refreshed (host_degraded=false)"
      else
        echo "[watch-r4s4] window degraded mid-run; record NOT shipped"
        CALM_STREAK=0
        continue
      fi
    else
      echo "[watch-r4s4] kernel bench FAILED"; exit 1
    fi
    echo "[watch-r4s4] headline bench"
    if python bench.py > /tmp/bench_r4s4_raw.txt 2>/tmp/bench_r4s4.err \
       && tail -1 /tmp/bench_r4s4_raw.txt | python -c "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
      tail -1 /tmp/bench_r4s4_raw.txt > BENCH/local_r4_calm.json
      echo "[watch-r4s4] bench recorded:"
      cat BENCH/local_r4_calm.json
      exit 0
    fi
    echo "[watch-r4s4] headline bench FAILED"; exit 1
  fi
  sleep 90
done
