"""Kernel micro-benchmark mirroring the reference's bin/benchmark gates
(/root/reference/bin/benchmark:10-20,69-77):

  * per-message filter latency — reference CI gate: <= 350 ms/message
    (with a real MITIE model; ours has no NER model so the comparison is
    generous to the reference)
  * batch vs individual speedup — reference gate: >= 2.5x
    (their batch path shares one model; our batch path amortizes plan
    compilation and the substitution machinery)

Same protocol: 3 fixed messages, 1 warmup, 3 iterations.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from top_secret_spark.kernel.batch import filter_all_local  # noqa: E402
from top_secret_spark.kernel.scrub import filter_text, restore_text  # noqa: E402

# the reference's three benchmark messages are email+credit-card texts
# (bin/benchmark:16-20); same shape here
MESSAGES = [
    "Hi, my email is alice@example.com and my card is 4242-4242-4242-4242.",
    "Contact bob@test.org about the charge on 4141414141414141 today.",
    "Send receipts to carol@mail.example.net; card 4242424242424242 failed.",
]

ITERATIONS = 3


def main():
    # warmup (compiles patterns, primes caches) — bin/benchmark:10
    for m in MESSAGES:
        filter_text(m)
    filter_all_local(MESSAGES)

    t0 = time.perf_counter()
    for _ in range(ITERATIONS):
        results = [filter_text(m) for m in MESSAGES]
    individual_sec = (time.perf_counter() - t0) / ITERATIONS

    t0 = time.perf_counter()
    for _ in range(ITERATIONS):
        gmap, items = filter_all_local(MESSAGES)
    batch_sec = (time.perf_counter() - t0) / ITERATIONS

    t0 = time.perf_counter()
    for _ in range(ITERATIONS):
        restore_text(items[0][0], gmap)
    restore_sec = (time.perf_counter() - t0) / ITERATIONS

    per_message_ms = individual_sec / len(MESSAGES) * 1000
    # the reference's speedup definition (bin/benchmark:54-58):
    # avg individual / avg batch, both per whole message set
    speedup = individual_sec / batch_sec if batch_sec > 0 else float("inf")

    print(json.dumps({
        "per_message_ms": round(per_message_ms, 4),
        "reference_gate_ms": 350,
        "per_message_ok": per_message_ms <= 350,
        "batch_speedup": round(speedup, 3),
        "reference_gate_speedup": 2.5,
        "restore_ms": round(restore_sec * 1000, 4),
        "iterations": ITERATIONS,
        "note": (
            "reference gates measured with a real MITIE NER model; this "
            "kernel runs regex-only (NER entities are injected upstream), "
            "so per-message latency is not directly comparable — reported "
            "for the regression-tracking purpose the reference uses it for"
        ),
    }))


if __name__ == "__main__":
    main()
