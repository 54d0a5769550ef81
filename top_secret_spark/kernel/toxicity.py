"""Dictionary-based toxicity scoring ([north-rule] stage).

BASELINE.json north_rule names a "PII/toxicity-scrub pipeline"; the
reference repo has no toxicity component, so this stage is engine-native:
a deterministic wordlist scorer in the same style as the heuristic
quality rules — no model download, fully reproducible, and expressible
in all three dialects we verify against (Python ``re`` kernel, Spark
``regexp_count`` Catalyst column, DuckDB ``regexp_extract_all`` oracle).

Score = matches of the toxic-term alternation in ``lower(text)`` divided
by the word count (min 1).  The pattern uses only ASCII letters and
``\\b`` boundaries, which mean the same thing in Python ``re.ASCII``,
Java's default ``\\w``, and RE2 — verified by the q28 oracle.

Terms are ordered longest-first so multi-word phrases win over any
single-word prefix in ordered-alternation engines.
"""

from __future__ import annotations

import re

# deliberately mild, non-slur insult/abuse vocabulary — the point is the
# pipeline stage, swappable for a production lexicon via ``make_pattern``
TOXIC_TERMS = (
    "kill yourself",
    "go to hell",
    "piece of garbage",
    "waste of space",
    "shut up",
    "worthless",
    "disgusting",
    "pathetic",
    "scumbag",
    "dumbass",
    "jackass",
    "moron",
    "idiot",
    "loser",
    "freak",
)


def make_pattern(terms=TOXIC_TERMS) -> str:
    ordered = sorted(terms, key=len, reverse=True)
    return r"\b(?:" + "|".join(re.escape(t) for t in ordered) + r")\b"


TOXICITY_PATTERN = make_pattern()
_TOX_RE = re.compile(TOXICITY_PATTERN, re.ASCII)

_WORD_RE = re.compile(r"\S+")


def toxic_match_count(text: str) -> int:
    return len(_TOX_RE.findall((text or "").lower()))


def toxicity_score(text: str) -> float:
    """Toxic-term matches per word, in [0, ~1]."""
    words = len(_WORD_RE.findall(text or ""))
    return toxic_match_count(text) / max(words, 1)
