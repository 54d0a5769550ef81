"""Batch (multi-message) scrub with globally consistent labels — kernel
reference implementation of ops 15-18.

Mirrors the reference exactly:
  * per-message filter pass — lib/top_secret/text/result.rb:34-40
  * global label assignment — lib/top_secret/text/global_mapping.rb:26-47
    (first-seen value wins; per-type counters from 1 —
    text/label_sequence.rb:14-25; type from the key of the FIRST
    occurrence — category.rb:39-41)
  * global re-substitution + per-item mapping — text/result.rb:47-59
    (re-scrub the ORIGINAL input with the global map; per-item mapping =
    global keys actually present in the output, in GLOBAL-mapping order —
    Ruby Hash#slice keeps receiver order)
  * orchestration — text/batch_result.rb:33-39

The distributed equivalent lives in operators/batch.py and is tested
against this implementation.
"""

from __future__ import annotations

import re

from .categories import type_from_key
from .filters import DEFAULT_CONFIG, ScrubConfig
from .scrub import scan_text, substitute_text

_PLACEHOLDER_RE = re.compile(r"\[([^\]]+)\]")


def global_mapping_from_mappings(
    mappings: list[list[tuple[str, str]]],
) -> list[tuple[str, str]]:
    """Ops 16: iterate per-message mappings in message order, entries in
    insertion order; first-unseen value gets the next per-type sequence
    number (global_mapping.rb:26-47)."""
    counters: dict[str, int] = {}
    value_to_global: dict[str, str] = {}
    out: list[tuple[str, str]] = []
    for mapping in mappings:
        if not mapping:
            continue  # global_mapping.rb:27 skips non-sensitive results
        for key, value in mapping:
            if value in value_to_global:
                continue
            label_type = type_from_key(key)
            counters[label_type] = counters.get(label_type, 0) + 1
            global_key = f"{label_type}_{counters[label_type]}"
            value_to_global[value] = global_key
            out.append((global_key, value))
    return out


def with_global_labels(
    inputs: list[str], global_mapping: list[tuple[str, str]]
) -> list[tuple[str, list[tuple[str, str]]]]:
    """Op 17: re-substitute each ORIGINAL input with the global map;
    recover the per-item mapping from placeholders present in the output
    (result.rb:47-59).  Note the reference's accepted quirk: a literal
    ``[FOO_1]`` in user text that collides with a global key binds
    spuriously."""
    global_keys = {k for k, _ in global_mapping}
    items = []
    for text in inputs:
        output = substitute_text(text, global_mapping)
        found = set(_PLACEHOLDER_RE.findall(output))
        item_mapping = [(k, v) for k, v in global_mapping
                        if k in found and k in global_keys]
        items.append((output, item_mapping))
    return items


def filter_all_local(
    messages: list[str],
    entities_list: list[list[dict]] | None = None,
    config: ScrubConfig = DEFAULT_CONFIG,
):
    """Ops 15-18 end-to-end (batch_result.rb:33-39) →
    (global_mapping, [(output, item_mapping), ...])."""
    mappings = [
        scan_text(m, entities_list[i] if entities_list else None, config)
        for i, m in enumerate(messages)
    ]
    gmap = global_mapping_from_mappings(mappings)
    items = with_global_labels(messages, gmap)
    return gmap, items
