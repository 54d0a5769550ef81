#!/bin/bash
# Round-5 calm watcher: re-take the headline bench whenever the host
# looks calm, ship the first record whose calm_round flag is true to
# BENCH/local_r5_calm.json, then exit.  The kernel record was retaken
# separately this round (per-comparison gating hunts its own windows).
set -u
cd /root/repo
echo "[watch-r5] started $(date -u +%H:%M:%SZ)"
for i in $(seq 1 40); do
  P=$(python -c "
import numpy as np, time
(np.random.rand(20_000_000)*1.5).sum()  # warm
a = np.random.rand(20_000_000)
t0 = time.perf_counter(); a*1.5; print(round(time.perf_counter()-t0, 3))")
  echo "[watch-r5] probe $P"
  if python -c "exit(0 if float('$P') < 0.45 else 1)"; then
    python bench.py > /tmp/bench_watch_r5.log 2>&1
    LINE=$(grep -a '^{"metric"' /tmp/bench_watch_r5.log | tail -1)
    CALM=$(echo "$LINE" | python -c "import json,sys; print(json.load(sys.stdin).get('calm_round'))")
    echo "[watch-r5] run done calm_round=$CALM"
    if [ "$CALM" = "True" ]; then
      echo "$LINE" > BENCH/local_r5_calm.json
      echo "[watch-r5] shipped BENCH/local_r5_calm.json"
      exit 0
    fi
  fi
  sleep 120
done
echo "[watch-r5] gave up after 40 tries"
