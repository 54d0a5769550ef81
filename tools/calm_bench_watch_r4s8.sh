#!/bin/bash
# Session-8 calm watcher.  Same scope as r4s6 (kernel -> headline; the
# scaling record stands) but adapted to the session-7/8 tooling:
#   * kernel_bench now gates PER COMPARISON (ec4344b), so the watcher
#     starts it on a merely-plausible probe and lets each comparison
#     hunt its own calm window (generous TRIES/WAIT below); ship iff
#     host_degraded=false, i.e. every comparison landed calm.
#   * bench.py now runs ADAPTIVE rounds (8a8653e) and self-reports
#     `calm_round`; ship iff calm_round is true.
# Also refreshes the record the shipping KERNEL.json predates: the
# blocked short-clip resample gather (d7da2be) measures 2.2x where the
# Aug-19 record shows 1.19x.
set -u
cd /root/repo
PRE_GATE=0.9   # plausible-window pre-gate; per-comparison gate is 0.45
echo "[watch-r4s8] started $(date -u +%H:%M:%SZ)"
while true; do
  P=$(python -c "
import numpy as np, time
a = np.random.rand(20_000_000)
t0 = time.perf_counter(); b = a * 1.5; t1 = time.perf_counter()
print(f'{t1-t0:.3f}')")
  echo "[watch-r4s8] $(date -u +%H:%M:%SZ) probe=${P}s"
  if ! python -c "import sys; sys.exit(0 if float('${P}') < ${PRE_GATE} else 1)"; then
    sleep 45; continue
  fi

  echo "[watch-r4s8] plausible window — kernel bench (per-comparison gating)"
  if KERNEL_BENCH_TRIES=12 KERNEL_BENCH_WAIT=20 \
     python tools/kernel_bench.py > /tmp/kernel_r4s8.json 2>/tmp/kernel_r4s8.err; then
    DEG=$(python -c "import json; print(json.load(open('/tmp/kernel_r4s8.json'))['host_degraded'])")
    if [ "$DEG" = "False" ]; then
      cp /tmp/kernel_r4s8.json BENCH/KERNEL.json
      echo "[watch-r4s8] KERNEL.json refreshed (host_degraded=false)"
    else
      W=$(python -c "import json; print(json.load(open('/tmp/kernel_r4s8.json'))['worst_arm_probe_sec'])")
      echo "[watch-r4s8] some comparison never landed calm (worst arm probe=${W}); NOT shipped"
      sleep 45; continue
    fi
  else
    echo "[watch-r4s8] kernel bench FAILED"; tail -5 /tmp/kernel_r4s8.err; exit 1
  fi

  echo "[watch-r4s8] headline bench (adaptive rounds)"
  if python bench.py > /tmp/bench_r4s8_raw.txt 2>/tmp/bench_r4s8.err \
     && tail -1 /tmp/bench_r4s8_raw.txt | python -c "import json,sys; json.loads(sys.stdin.read())" 2>/dev/null; then
    CALM=$(tail -1 /tmp/bench_r4s8_raw.txt | python -c "import json,sys; print(json.loads(sys.stdin.read()).get('calm_round'))")
    if [ "$CALM" = "True" ]; then
      tail -1 /tmp/bench_r4s8_raw.txt > BENCH/local_r4_calm.json
      echo "[watch-r4s8] headline recorded:"; cat BENCH/local_r4_calm.json
      exit 0
    else
      echo "[watch-r4s8] no calm-bracketed round; headline NOT shipped"
      sleep 45; continue
    fi
  fi
  echo "[watch-r4s8] headline bench FAILED"; tail -5 /tmp/bench_r4s8.err; exit 1
done
