"""Default PII regex patterns, byte-for-byte faithful to the reference.

Reference: /root/reference/lib/top_secret/constants.rb:8-24 (patterns),
:27 (MIN_CONFIDENCE_SCORE), :30 (LABEL_DELIMITER).

All patterns are compiled with ``re.ASCII`` because Ruby's ``\\d``/``\\w``/
``\\s``/``\\b`` are ASCII-only on UTF-8 strings, while Python defaults them
to Unicode.  The reference writes two of the patterns in free-spacing
(``/x``) mode; we write the equivalent single-line pattern strings to avoid
any verbose-mode dialect differences.
"""

from __future__ import annotations

import re

# constants.rb:8-11 — 16 digits starting 3-6, contiguous or 4x4 groups
# separated by whitespace / '+' / '-'.  No Luhn check.
CREDIT_CARD_PATTERN = r"\b[3456]\d{15}\b|\b[3456]\d{3}(?:[\s+-]\d{4}){3}\b"

# constants.rb:14-18 — RFC-ish local part, hostname labels <= 63 chars,
# optional dotted domain labels.  Deliberately unanchored (no \b): matches
# inside larger tokens, exactly like the reference.
EMAIL_PATTERN = (
    r"[a-zA-Z0-9.!#$%&'*+/=?^_`{|}~-]+@"
    r"[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?"
    r"(?:\.[a-zA-Z0-9](?:[a-zA-Z0-9-]{0,61}[a-zA-Z0-9])?)*"
)

# constants.rb:21 — optional 1-2 digit country code, 3-3-4 with a separator
# required between groups (a contiguous 10-digit run does NOT match).
PHONE_PATTERN = r"\b(?:\+\d{1,2}\s)?\(?\d{3}\)?[\s+.-]\d{3}[\s+.-]\d{4}\b"

# constants.rb:24 — 3-2-4; disjoint from the phone shape (3-3-4).
SSN_PATTERN = r"\b\d{3}[\s+-]\d{2}[\s+-]\d{4}\b"

# Not in the reference: a URL pattern offered as an extra filter for the
# quality-filter pipeline (BASELINE.json north_star lists URL scrubbing).
URL_PATTERN = r"\bhttps?://[a-zA-Z0-9.-]+(?::\d+)?(?:/[^\s\])\"']*)?"

MIN_CONFIDENCE_SCORE = 0.5  # constants.rb:27
LABEL_DELIMITER = "_"  # constants.rb:30

# Pattern a restore pass uses to report leftover placeholders
# (filtered_text.rb:55).  Note the single \d: multi-digit keys like
# [PERSON_10] are deliberately never reported unrestored (reference quirk,
# spec/top_secret/filtered_text_spec.rb:31-43).
UNRESTORED_PATTERN = r"\[\w*_\d\]"

# Labels must be letters with single underscores (text.rb:275-281).
LABEL_VALIDATION_PATTERN = r"[a-zA-Z]+(_[a-zA-Z]+)*"

_FLAGS = re.ASCII


def compile_ascii(pattern: str) -> re.Pattern:
    """Compile with ASCII-only \\d/\\w/\\s/\\b semantics (Ruby parity)."""
    return re.compile(pattern, _FLAGS)


CREDIT_CARD_RE = compile_ascii(CREDIT_CARD_PATTERN)
EMAIL_RE = compile_ascii(EMAIL_PATTERN)
PHONE_RE = compile_ascii(PHONE_PATTERN)
SSN_RE = compile_ascii(SSN_PATTERN)
URL_RE = compile_ascii(URL_PATTERN)
UNRESTORED_RE = compile_ascii(UNRESTORED_PATTERN)
LABEL_VALIDATION_RE = compile_ascii(LABEL_VALIDATION_PATTERN)
