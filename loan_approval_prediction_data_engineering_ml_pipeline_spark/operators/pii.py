"""PII detection and redaction — the privacy-scrubbing pass every
large-scale training-data pipeline runs before text leaves curation
(Dolma, Soldaini et al. 2024 §2.3 masks emails/IPs/phones; CCNet and
C4 strip the same classes; GDPR/CCPA make it non-optional).

This module extends the r3 ``functions.text.scrub_pii`` mask pass
(URL/email/phone, driver-verified by the ``pii_scrub`` query) into the
full financial-identifier rule table — credit cards, SSNs, IPv4s — as
a structured (class, pattern, placeholder) relation, and adds the
DETECTION side: per-class counts measured on the raw text, which is
what an audit/compliance report needs and what redaction alone loses.

Reference parity note: the reference repo (LP.ipynb / MY.ipynb) is a
loan-ML notebook with no corpus tooling — this family belongs to the
beyond-reference training-data surface the brief mandates.

Scale design: the whole pass is chained JVM-side ``regexp_count`` /
``regexp_replace`` expressions — map-only, whole-stage-codegen'd, zero
Python, zero shuffles. At 100 TB the cost is the text scan itself,
which is the floor; detection counts and the redacted payload come out
of the SAME single pass over the bytes. The patterns are deliberately
written in the common subset of Java regex (Spark) and RE2 (DuckDB) —
no backreferences, no lookaround — so a SQL oracle re-derives every
count and every redacted byte, and the same patterns port to any
engine a pipeline hands off to.

Pattern order matters and is fixed: wide multi-group numbers (credit
card) redact before narrower ones (SSN, phone) so a card number is
never half-eaten by the phone rule; the chain is applied to the text
while counts are measured on the ORIGINAL text per class, so
reporting is independent of redaction order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (class, pattern, replacement) in REDACTION ORDER. The common
#: Java-regex/RE2 subset only: character classes, bounded repeats,
#: non-capturing groups, \b word boundaries.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CREDIT_CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_counts(text: Column | str) -> list[Column]:
    """One ``n_<class>`` count column per PII class, measured on the
    raw text (independent of redaction order)."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]


def redact_text(text: Column | str) -> Column:
    """The redacted payload: every PII class replaced by its typed
    placeholder token, applied in :data:`PII_RULES` order."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    out_col: str = "text",
    with_counts: bool = True,
) -> DataFrame:
    """``df`` with ``out_col`` redacted (and per-class ``n_<class>``
    detection counts when ``with_counts``). Map-only — safe to chain
    before any downstream dedup/quality pass; redact FIRST so PII never
    reaches fingerprints, shards, or model features."""
    out = df
    if with_counts:
        out = out.select("*", *pii_counts(text_col))
    return out.withColumn(out_col, redact_text(text_col))
