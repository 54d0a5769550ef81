"""The scrub kernel: scan → mapping → single-pass substitution → restore.

Pure Python (no Spark imports); wrapped by Arrow pandas UDFs in
``top_secret_spark.operators.scrub``.  Every semantic choice below is
pinned to the reference:

  * scan / dispatch / mapping build — lib/top_secret/text.rb:137-158,204-211
  * single-pass ordered-alternation substitution — text.rb:216-224 and the
    v1.0.1 no-refilter fix (CHANGELOG.md:5-7)
  * filter (scan + substitute) — text.rb:165-171
  * restore — lib/top_secret/filtered_text.rb:43-58

The mapping is an insertion-ordered list of (key, value) pairs — order is
load-bearing (substitution precedence and restore order), which is why the
Spark schema is array<struct<key,value>>, never MapType.
"""

from __future__ import annotations

import re
from functools import lru_cache

from .filters import DEFAULT_CONFIG, NERFilter, RegexFilter, ScrubConfig, TopSecretError
from .patterns import UNRESTORED_RE


def scan_text(
    text: str,
    entities: list[dict] | None = None,
    config: ScrubConfig = DEFAULT_CONFIG,
) -> list[tuple[str, str]]:
    """Detect sensitive values; return the ordered mapping (text.rb:137-158).

    For each active filter in order: regex filters scan the text, NER
    filters select from ``entities`` (pre-extracted, like the stubbed
    Mitie model in spec/spec_helper.rb:26-31).  Matched values are
    de-duplicated preserving first occurrence and enumerated from 1 per
    filter (text.rb:204-211); a later filter re-matching a value already
    mapped under the same key overwrites it (mapping.merge! semantics).
    """
    entities = entities or []
    mapping: dict[str, str] = {}
    for f in config.all_filters():
        if isinstance(f, RegexFilter):
            values = f.call(text)
        elif isinstance(f, NERFilter):
            values = f.call(entities, config.min_confidence_score)
        else:
            raise TopSecretError(
                "Unsupported filter. Expected RegexFilter or NERFilter, "
                f"but got {type(f).__name__}"
            )
        # dedupe preserving first-occurrence order, enumerate from 1
        for i, value in enumerate(dict.fromkeys(values), 1):
            mapping[f"{f.label}_{i}"] = value
    return list(mapping.items())


def substitute_text(text: str, mapping: list[tuple[str, str]]) -> str:
    """Single-pass ordered-alternation substitution (text.rb:216-224).

    Invert the mapping to value → "[KEY]" (last writer wins for duplicate
    values, so a later filter's label takes precedence —
    spec/top_secret/text_spec.rb:65-79), then ONE left-to-right pass over
    the original text with an ordered alternation of literal-escaped
    values.  At each position the first alternative in mapping insertion
    order wins (Ruby Regexp.union and Python re share ordered-alternation
    semantics).  Because it is a single pass, emitted placeholder tokens
    can never be re-matched — the reference's v1.0.1 correctness fix.
    Chained regexp_replace calls would re-introduce that bug, which is why
    this must live in a pandas UDF rather than Catalyst expressions.
    """
    if not mapping:
        return text
    value_to_label: dict[str, str] = {}
    for key, value in mapping:
        value_to_label[value] = f"[{key}]"
    if "" in value_to_label:
        # degenerate empty-string value (never produced by the built-in
        # patterns, possible from a pathological custom filter): keep
        # the regex path, whose empty-alternative semantics are the
        # definition
        pattern = "|".join(re.escape(v) for v in value_to_label)
        return re.sub(pattern, lambda m: value_to_label[m.group(0)], text)
    # Pure-string single pass with identical semantics to
    # `re.sub("|".join(map(re.escape, values)), ...)`: the regex engine
    # advances position by position and takes the FIRST alternative (in
    # mapping insertion order) matching at the current position — i.e.
    # earliest start wins, insertion order breaks same-start ties, and a
    # match's span is consumed (emitted placeholders can never re-match).
    # Building the alternation compiled a FRESH regex per row (values
    # differ row to row, so re's pattern cache never hits) — the compile
    # dominated the whole substitution stage; str.find is literal by
    # construction and needs no escaping.  Equivalence is
    # hypothesis-gated against the regex formulation.
    vals = list(value_to_label)
    events: list[tuple[int, int]] = []
    for oi, v in enumerate(vals):
        start = text.find(v)
        while start != -1:
            events.append((start, oi))
            start = text.find(v, start + 1)
    if not events:
        return text
    events.sort()
    out: list[str] = []
    cursor = 0
    for start, oi in events:
        if start < cursor:
            continue
        v = vals[oi]
        out.append(text[cursor:start])
        out.append(value_to_label[v])
        cursor = start + len(v)
    out.append(text[cursor:])
    return "".join(out)


def filter_text(
    text: str,
    entities: list[dict] | None = None,
    config: ScrubConfig = DEFAULT_CONFIG,
) -> tuple[str, list[tuple[str, str]]]:
    """scan + substitute → (scrubbed output, mapping) (text.rb:165-171)."""
    mapping = scan_text(text, entities, config)
    output = substitute_text(text, mapping) if mapping else text
    return output, mapping


def restore_text(
    text: str, mapping: list[tuple[str, str]]
) -> tuple[str, list[str], list[str]]:
    """Inverse scrub → (output, unrestored, restored) (filtered_text.rb:43-58).

    Sequential (NOT single-pass): for each mapping entry in order, if the
    placeholder "[KEY]" occurs in the current text, record it once in
    ``restored`` and replace ALL occurrences with the value (plain string
    replace, no regex, case-sensitive).  Afterwards ``unrestored`` = every
    remaining token shaped like ``[\\w*_\\d]`` in document order,
    duplicates kept.  Reference quirks preserved: the unrestored pattern
    requires a SINGLE trailing digit, so [PERSON_10] is never reported
    unrestored even though restoring it works (string containment, not the
    regex) — spec/top_secret/filtered_text_spec.rb:31-43.
    """
    output = text
    restored: list[str] = []
    for key, value in mapping:
        placeholder = f"[{key}]"
        if placeholder in output:
            restored.append(placeholder)
            output = output.replace(placeholder, value)
    unrestored = UNRESTORED_RE.findall(output)
    return output, unrestored, restored


# ---------------------------------------------------------------------------
# Batch kernel — the shape the pandas UDFs call.  One Python loop per Arrow
# batch (vectorized at the Spark boundary; regexes precompiled per config).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _compiled_plan(config: ScrubConfig):
    """Precompile the filter plan once per (executor-worker, config)."""
    return tuple(config.all_filters())


def scrub_batch(
    texts,
    entities_list=None,
    config: ScrubConfig = DEFAULT_CONFIG,
):
    """Scrub an iterable of texts → (outputs, mappings) lists.

    ``entities_list`` is an optional parallel iterable of per-text entity
    lists (each entity a dict with text/tag/score).  Null texts pass
    through as ("", []).
    """
    plan = _compiled_plan(config)
    min_score = config.min_confidence_score
    outputs: list[str] = []
    mappings: list[list[tuple[str, str]]] = []
    n = len(texts)
    for i in range(n):
        text = texts[i]
        if text is None:
            outputs.append("")
            mappings.append([])
            continue
        entities = entities_list[i] if entities_list is not None else None
        entities = entities or []
        mapping: dict[str, str] = {}
        for f in plan:
            if f.kind == "regex":
                values = f.call(text)
            else:
                values = f.call(entities, min_score)
            for j, value in enumerate(dict.fromkeys(values), 1):
                mapping[f"{f.label}_{j}"] = value
        items = list(mapping.items())
        outputs.append(substitute_text(text, items) if items else text)
        mappings.append(items)
    return outputs, mappings


def pii_char_spans(
    text: str,
    entities: list[dict] | None = None,
    config: ScrubConfig = DEFAULT_CONFIG,
    mapping: list[tuple[str, str]] | None = None,
) -> list[tuple[int, int, str]]:
    """Character spans the single-pass substitution would consume, as
    ``(start, end, label)`` — the SAME event scan as ``substitute_text``
    (earliest start wins, mapping insertion order breaks same-start
    ties, a consumed span suppresses any event starting inside it), so
    a span-driven redactor (audio bleep, highlight UI) is guaranteed to
    cover exactly the characters the text scrub replaces — no more, no
    less.  Labels follow ``value_to_label`` (last writer wins for
    duplicate values), identical to the emitted placeholder.

    Pass ``mapping`` when the caller already ran ``scan_text`` on this
    exact (text, entities, config) — the regex scan dominates the scrub
    stage's cost and must not run twice per row."""
    if mapping is None:
        mapping = scan_text(text, entities, config)
    if not mapping:
        return []
    value_to_label: dict[str, str] = {}
    for key, value in mapping:
        value_to_label[value] = key
    vals = [v for v in value_to_label if v != ""]
    events: list[tuple[int, int]] = []
    for oi, v in enumerate(vals):
        start = text.find(v)
        while start != -1:
            events.append((start, oi))
            start = text.find(v, start + 1)
    events.sort()
    spans: list[tuple[int, int, str]] = []
    cursor = 0
    for start, oi in events:
        if start < cursor:
            continue
        v = vals[oi]
        spans.append((start, start + len(v), value_to_label[v]))
        cursor = start + len(v)
    return spans
