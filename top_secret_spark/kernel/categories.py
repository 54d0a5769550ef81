"""Category projections over a mapping.

The reference exposes these as dynamic Ruby methods (``result.emails``,
``result.email_mapping?`` — lib/top_secret/mapping.rb:32-87,
lib/top_secret/category.rb:16-119).  Here they are plain functions over an
ordered mapping (list of (key, value)); the Spark-side equivalents are
column expressions in ``top_secret_spark.operators.scrub``.
"""

from __future__ import annotations

import re

from .patterns import LABEL_DELIMITER


def type_from_key(key: str) -> str:
    """Strip the trailing ``_N`` sequence: ``EMAIL_1`` → ``EMAIL``
    (category.rb:39-41 — rpartition on the label delimiter)."""
    return key.rpartition(LABEL_DELIMITER)[0]


def key_pattern(category_type: str) -> re.Pattern:
    """Exact-type key matcher: ``^TYPE_\\d+$`` (category.rb:112-114).
    ``EMAIL_ADDRESS_1`` never matches type ``email``
    (spec/top_secret/result_spec.rb:103-125)."""
    return re.compile(
        rf"\A{re.escape(category_type.upper())}{re.escape(LABEL_DELIMITER)}\d+\Z"
    )


def filter_mapping(
    mapping: list[tuple[str, str]], category_type: str
) -> list[tuple[str, str]]:
    """Sub-mapping whose keys belong to ``category_type`` (category.rb:104-117)."""
    pat = key_pattern(category_type)
    return [(k, v) for k, v in mapping if pat.match(k)]


def category_values(mapping: list[tuple[str, str]], category_type: str) -> list[str]:
    return [v for _, v in filter_mapping(mapping, category_type)]


def has_category(mapping: list[tuple[str, str]], category_type: str) -> bool:
    return bool(filter_mapping(mapping, category_type))


def categories(
    mapping: list[tuple[str, str]], active_filter_labels: list[str] | None = None
) -> list[str]:
    """Category types with >= 1 match, in first-seen order (mapping.rb:62-66,
    category.rb:27-33).  Candidate types come from mapping keys plus active
    filter labels, downcased, de-duplicated."""
    candidates = [type_from_key(k).lower() for k, _ in mapping]
    candidates += [lbl.lower() for lbl in (active_filter_labels or [])]
    seen = dict.fromkeys(candidates)
    return [t for t in seen if has_category(mapping, t)]


def sensitive(mapping: list[tuple[str, str]]) -> bool:
    """mapping non-empty (mapping.rb:34-37)."""
    return bool(mapping)


def pluralize(word: str) -> str:
    """Minimal inflector for category method sugar (category.rb:57-59 uses
    ActiveSupport#pluralize).  Covers the label vocabulary this engine
    meets; API sugar only — never used for data semantics."""
    irregular = {"person": "people", "child": "children", "man": "men", "woman": "women"}
    for stem, plural in irregular.items():
        if word.lower().endswith(stem):
            return word[: len(word) - len(stem)] + plural
    if re.search(r"(s|x|z|ch|sh)\Z", word):
        return word + "es"
    if re.search(r"[^aeiou]y\Z", word):
        return word[:-1] + "ies"
    return word + "s"
