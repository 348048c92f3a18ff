"""PII redaction — scalar column functions for corpus cleaning.

A training-data pipeline redacts personally identifiable information
before anything else sees the text. These are pure built-in
``regexp_replace`` chains (JVM-side, whole-stage codegen — the corpus
never leaves the executors and no Python touches the hot path), with
portable patterns (character classes only — identical semantics in
Java regex and RE2-style engines).

Patterns are deliberately high-recall/simple (emails, IPv4, long
digit runs for phone/card/ssn shapes); production systems layer
validators (e.g. Luhn) behind the same plan shape — the regex pass is
the full-scan stage and stays a narrow map either way.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: pattern → replacement token, applied in order (most specific first:
#: emails contain digit runs, IPs are digit runs with dots).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    (r"[0-9][0-9 ().-]{7,}[0-9]", "<NUMBER>"),
]


def redact_pii(col: Column | str) -> Column:
    """The input text with emails, IPv4 addresses, and long digit
    sequences (phone/card/ssn shapes) replaced by typed placeholder
    tokens."""
    out = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column | str) -> Column:
    """struct(n_email, n_ip, n_number): how many of each PII shape the
    redaction pass would replace — the audit/decision-log column a
    cleaning pipeline stores next to the redacted text."""
    c = F.col(col) if isinstance(col, str) else col
    fields = []
    remaining = c
    for (pattern, token), name in zip(
        PII_PATTERNS, ["n_email", "n_ip", "n_number"]
    ):
        fields.append(
            F.size(F.regexp_extract_all(remaining, F.lit(pattern), 0))
            .cast("long")
            .alias(name)
        )
        # later patterns must not re-match inside earlier redactions
        remaining = F.regexp_replace(remaining, pattern, token)
    return F.struct(*fields)
