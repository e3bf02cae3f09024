"""PII detection + redaction for training-data pipelines.

A standard pre-training scrub pass: count and mask emails, phone
numbers, IPv4 addresses, and card-like digit runs. Everything is a
JVM-side regexp scalar expression (``regexp_count`` /
``regexp_replace``) that fuses into whole-stage codegen — per-row cost
is regex matching only, no shuffle, no Python, so the pass rides the
initial 100 TB scan for free.

The patterns deliberately stay inside the regex subset shared by Java's
engine and RE2 (character classes, bounded repetition, alternation — no
backreferences or lookarounds), so the same pattern strings drive both
the Spark plan and the DuckDB oracle.

No reference analog (the reference has no PII handling); this is part of
the training-data-pipeline extension suite.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered: redaction applies top to bottom, so earlier patterns must not
# produce text that later patterns match (the [TAG] tokens contain no
# digits or '@').
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # card before phone: a 16-digit run contains phone-sized digit runs
    "card": (r"\b[0-9]{13,19}\b", "[CARD]"),
    # separators restricted to [- ] (no '.'): a dotted phone pattern can
    # match inside a 3-digit-segment IPv4, making redaction order-ambiguous.
    # Three alternatives, structurally disjoint at any match position (so
    # Java's leftmost-first and RE2's alternation agree): separated
    # national/international, paren area code "(555) 123-4567", and
    # unseparated international "+14155551234" (the leading '+' is the
    # context that licenses redacting a bare digit run; E.164 caps at 15
    # digits — a '+'-prefixed 13-19 digit run is taken by the earlier
    # card pattern, leaving '+[CARD]').
    "phone": (
        r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}(?:[- ][0-9]{3,4})?"
        r"|\([0-9]{3}\) ?[0-9]{3}[- ][0-9]{4}"
        r"|\+[0-9]{8,15}\b",
        "[PHONE]",
    ),
    "ipv4": (
        r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
        "[IP]",
    ),
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_count(c: Column | str, kind: str) -> Column:
    """Occurrence count of one PII kind (``email``/``card``/``phone``/
    ``ipv4``)."""
    pattern, _ = PII_PATTERNS[kind]
    return F.regexp_count(_col(c), F.lit(pattern)).cast("bigint")


def redact_pii(c: Column | str, kinds: list[str] | None = None) -> Column:
    """Mask every PII occurrence with its ``[TAG]`` token. Application
    order is the PII_PATTERNS order (card runs before phone so a card
    number is not half-eaten as a phone number)."""
    out = _col(c)
    for kind in kinds if kinds is not None else list(PII_PATTERNS):
        pattern, tag = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, tag)
    return out


def pii_counts_struct(c: Column | str) -> Column:
    """All per-kind counts as one struct (single pass over the plan)."""
    return F.struct(
        *[pii_count(c, kind).alias(f"n_{kind}") for kind in PII_PATTERNS]
    )
