"""Filter specs and filter-set composition.

Reference semantics:
  * ``RegexFilter``  — lib/top_secret/filters/regex.rb:6-29
  * ``NERFilter``    — lib/top_secret/filters/ner.rb:6-40
  * filter-set composition (defaults + overrides + customs, fixed order)
                     — lib/top_secret/text.rb:229-247,287-296
  * default instances — lib/top_secret.rb:52-57
  * label validation — lib/top_secret/text.rb:275-281

Filters are plan-time *configuration*, not data: they are plain picklable
Python objects captured into pandas-UDF closures and broadcast with the
task binary.  Users extend the engine by supplying filter specs (data),
never per-row code — the hot path stays vectorized.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .patterns import (
    CREDIT_CARD_PATTERN,
    EMAIL_PATTERN,
    LABEL_VALIDATION_RE,
    MIN_CONFIDENCE_SCORE,
    PHONE_PATTERN,
    SSN_PATTERN,
    URL_PATTERN,
    compile_ascii,
)


class TopSecretError(Exception):
    """Engine-level error (reference: lib/top_secret/error.rb:4)."""


class MalformedLabel(TopSecretError):
    """Invalid redaction label (reference: lib/top_secret/error.rb:5)."""


def validate_label(label: str | None) -> str:
    """Reject blank or malformed labels (text.rb:275-281).

    Valid: letters with single interior underscores (``EMAIL``,
    ``IP_ADDRESS``).  Invalid: blank, digits, leading/trailing/double
    underscores, any other character.
    """
    if label is None or str(label).strip() == "":
        raise MalformedLabel("You must provide a label.")
    label = str(label)
    if not LABEL_VALIDATION_RE.fullmatch(label):
        raise MalformedLabel(
            "Unsupported label. Labels must contain only letters and "
            f"underscores: '{label}'"
        )
    return label


@dataclass(frozen=True)
class RegexFilter:
    """Extract-all regex filter (filters/regex.rb:21-23).

    ``call`` returns every non-overlapping match, leftmost-first, in
    document order — Ruby ``String#scan`` with a group-free pattern, which
    is exactly Python ``findall`` on a group-free pattern.
    """

    label: str
    pattern: str

    def __post_init__(self) -> None:
        object.__setattr__(self, "_re", compile_ascii(self.pattern))

    def call(self, text: str) -> list[str]:
        return self._re.findall(text)

    @property
    def kind(self) -> str:
        return "regex"


@dataclass(frozen=True)
class NERFilter:
    """Entity filter (filters/ner.rb:23-26).

    Keeps entities whose ``tag`` equals this filter's tag (upcased at
    construction, ner.rb:15) and whose ``score`` is >= the per-filter
    threshold, falling back to the config-global threshold.  ``>=`` is
    inclusive (spec/spec_helper.rb:22 relies on score == threshold).
    """

    label: str
    tag: str
    min_confidence_score: float | None = None

    def __post_init__(self) -> None:
        object.__setattr__(self, "tag", str(self.tag).upper())

    def call(self, entities, global_min_score: float = MIN_CONFIDENCE_SCORE):
        threshold = (
            self.min_confidence_score
            if self.min_confidence_score is not None
            else global_min_score
        )
        return [
            e["text"]
            for e in entities
            if e["tag"] == self.tag and e["score"] >= threshold
        ]

    @property
    def kind(self) -> str:
        return "ner"


def dictionary_filter(label: str, terms: list[str]) -> RegexFilter:
    """Custom dictionary filter: literal terms compiled to one alternation.

    Ordered, literal-escaped — the Regexp.union idiom the reference uses
    for substitution (text.rb:222), offered here as a match filter.  Terms
    match case-sensitively in the order given.
    """
    if not terms:
        raise ValueError("dictionary_filter requires at least one term")
    return RegexFilter(label=label, pattern="|".join(re.escape(t) for t in terms))


DEFAULT_FILTER_KEYS = (
    "credit_card_filter",
    "email_filter",
    "phone_number_filter",
    "ssn_filter",
    "people_filter",
    "location_filter",
)


def default_filters() -> dict[str, object]:
    """The six default filter slots in fixed order (text.rb:287-296,
    top_secret.rb:52-57)."""
    return {
        "credit_card_filter": RegexFilter("CREDIT_CARD", CREDIT_CARD_PATTERN),
        "email_filter": RegexFilter("EMAIL", EMAIL_PATTERN),
        "phone_number_filter": RegexFilter("PHONE_NUMBER", PHONE_PATTERN),
        "ssn_filter": RegexFilter("SSN", SSN_PATTERN),
        "people_filter": NERFilter("PERSON", "person"),
        "location_filter": NERFilter("LOCATION", "location"),
    }


@dataclass(frozen=True)
class ScrubConfig:
    """Explicit, immutable pipeline configuration.

    Replaces the reference's mutable module globals (top_secret.rb:46-63):
    Spark closures capture config at plan time, so globals would be a
    footgun.  ``overrides`` maps a default slot name to a replacement
    filter or ``None`` to disable the slot; unknown keys raise
    ``ValueError`` like the reference's assert_valid_keys
    (text.rb:245-247).
    """

    overrides: tuple = ()
    custom_filters: tuple = ()
    min_confidence_score: float = MIN_CONFIDENCE_SCORE

    def __post_init__(self) -> None:
        # accept a dict for ergonomics; store a tuple so the config is
        # hashable (the kernel lru-caches the compiled plan per config)
        if isinstance(self.overrides, dict):
            object.__setattr__(self, "overrides", tuple(self.overrides.items()))
        else:
            object.__setattr__(self, "overrides", tuple(self.overrides))
        unknown = {k for k, _ in self.overrides} - set(DEFAULT_FILTER_KEYS)
        if unknown:
            raise ValueError(
                f"Unknown filter key(s): {sorted(unknown)}. "
                f"Valid keys: {list(DEFAULT_FILTER_KEYS)}"
            )
        object.__setattr__(self, "custom_filters", tuple(self.custom_filters))

    def all_filters(self) -> list[object]:
        """Ordered active filters: defaults (with overrides applied,
        ``None`` slots dropped) then customs (text.rb:229-231)."""
        merged = default_filters()
        merged.update(dict(self.overrides))
        active = [f for f in merged.values() if f is not None]
        active.extend(self.custom_filters)
        for f in active:
            # unknown filter types raise here, driver-side, like the
            # reference's dispatch raise (text.rb:146-153)
            if not (hasattr(f, "label") and hasattr(f, "kind") and callable(getattr(f, "call", None))):
                raise TopSecretError(
                    f"Unsupported filter type: {type(f).__name__!s} — filters "
                    "need label/kind attributes and a call() method "
                    "(RegexFilter, NERFilter, or a compatible object)."
                )
            validate_label(f.label)
        return active

    def needs_entities(self) -> bool:
        return any(f.kind == "ner" for f in self.all_filters())


def url_filter() -> RegexFilter:
    """URL filter (label URL) over schemed URLs only (https?://...).

    Not a reference default (constants.rb has no URL pattern) — the
    north-star adds URL scrubbing to the quality-filter pipeline's
    default set.  Matching requires an explicit scheme so bare domains
    (e.g. the reference fixture 'ralph[at]thoughtbot.com') are never
    touched and reference-parity outputs stay byte-identical."""
    return RegexFilter("URL", URL_PATTERN)


DEFAULT_CONFIG = ScrubConfig()

# The north-star filter set: the reference's six default slots plus the
# URL filter (BASELINE.json north_star names email, phone, SSN,
# credit-card AND URL).  This is the pipeline's default; DEFAULT_CONFIG
# stays byte-faithful to the reference gem for parity surfaces.
NORTH_STAR_CONFIG = ScrubConfig(custom_filters=(url_filter(),))
