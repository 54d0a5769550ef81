"""Synthetic gazetteer NER model — the engine's model-INFERENCE stage.

The reference holds its MITIE model handle as a lazily-created module
singleton (ref: lib/top_secret/text.rb:21-33), and its CI never loads
the real model (spec/spec_helper.rb:26-31 injects entities).  The
injected-entities path (operators/scrub.py, pipeline entities_col)
mirrors that CI shape; THIS module completes the slot with a real
inference path: a deterministic model artifact shipped to executors via
SparkFiles, loaded at most once per Python worker into a process-local
singleton, and evaluated over Arrow batches.

The artifact format is deliberately trivial (a JSON gazetteer — no
model libraries exist in this sandbox); the machinery around it
(ship → worker-local singleton load → batched inference → the standard
entities column) is exactly what a MITIE/ONNX artifact would use, so
swapping in a real model changes only ``GazetteerModel``.
"""

from __future__ import annotations

import json
import re
from functools import lru_cache

GAZETTEER_FORMAT = "gazetteer-v1"


def write_gazetteer_model(path: str, entries) -> str:
    """Write a deterministic model artifact.  ``entries`` is an iterable
    of (text, tag, score) triples; serialization is key-sorted so the
    same entries always produce byte-identical artifacts (checkpoint /
    lineage friendliness)."""
    doc = {
        "format": GAZETTEER_FORMAT,
        "entries": [
            {"text": t, "tag": g, "score": float(s)} for t, g, s in entries
        ],
    }
    with open(path, "w") as f:
        json.dump(doc, f, sort_keys=True)
    return path


class GazetteerModel:
    """Compiled gazetteer: one alternation regex, longest-surface-first
    so overlapping names resolve greedily (like a real NER's longest
    span wins)."""

    def __init__(self, entries: list[dict]):
        self.entries = list(entries)
        by_len = sorted(self.entries, key=lambda e: -len(e["text"]))
        self._re = (
            re.compile(
                r"\b(?:" + "|".join(re.escape(e["text"]) for e in by_len) + r")\b"
            )
            if by_len
            else None
        )
        self._info = {
            e["text"]: (e["tag"], float(e["score"])) for e in self.entries
        }

    def extract(self, text: str | None) -> list[dict]:
        """text → [{text, tag, score}] with one entity per distinct
        surface form (the scrub kernel dedupes values anyway; emitting
        each form once keeps batches small)."""
        if not text or self._re is None:
            return []
        out: list[dict] = []
        seen: set[str] = set()
        for m in self._re.finditer(text):
            v = m.group(0)
            if v in seen:
                continue
            seen.add(v)
            tag, score = self._info[v]
            out.append({"text": v, "tag": tag, "score": score})
        return out


@lru_cache(maxsize=8)
def load_model(path: str) -> GazetteerModel:
    """Worker-local model singleton keyed by artifact path — the
    process loads and compiles the model at most once, however many
    tasks/batches run in it (ref text.rb:21-33 semantics; same pattern
    as the langid/perplexity table singletons)."""
    with open(path) as f:
        doc = json.load(f)
    if doc.get("format") != GAZETTEER_FORMAT:
        raise ValueError(
            f"unsupported NER model format {doc.get('format')!r} at {path}"
        )
    return GazetteerModel(doc["entries"])
