"""Gopher-style rule-based quality filtering (Rae et al. 2021, §A1.1;
the same rule-table family C4, RedPajama, Dolma, and FineWeb run before
any model-based scoring): named boolean document rules over cheap
text statistics, each a pure JVM expression, with the thresholds defined
ONCE here and compiled into both the Spark expressions and the DuckDB
oracle SQL — the :mod:`.pii` single-source-of-truth pattern applied to
quality rules.

Reference parity note: the reference repo (LP.ipynb / MY.ipynb) is a
loan-ML notebook with no corpus surface — this family belongs to the
beyond-reference training-data operators the brief mandates.

Scale design: every rule is a map-only expression over the document row
(token counts, mean word length, alphabetic ratio, stopword hits,
distinct-token ratio) — zero shuffles, zero Python, whole-stage-codegen.
At 100 TB the cost is the text scan, and the rules fuse with whatever
else the curation pass computes over the same scan. The per-source
report aggregates to source-cardinality rows (tiny).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import text as X

#: Rule thresholds (single source of truth for Spark AND the oracle).
#: Gopher's published bounds, with the word-count floor kept at the
#: paper's 50 — the synthetic ~50-token corpus then fails it for roughly
#: half the docs, which is exactly what makes the parity row non-trivial.
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MIN_ALPHA_RATIO = 0.6
MIN_STOPWORD_HITS = 2
MIN_DISTINCT_RATIO = 0.5

#: Rule names in report order. Each flag is True when the doc FAILS.
RULE_NAMES = (
    "word_count",
    "mean_word_len",
    "alpha_ratio",
    "stopword_hits",
    "repetition",
)


def gopher_flags(text: Column | str) -> list[Column]:
    """One ``fail_<rule>`` boolean column per rule (True = doc fails)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = X.tokens(c)
    n = F.size(toks)
    mwl = X.avg_token_len(c)
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    stop_hits = X.stopword_hits(c, X.STOPWORDS)
    return [
        ((n < MIN_WORDS) | (n > MAX_WORDS)).alias("fail_word_count"),
        (
            (mwl < MIN_MEAN_WORD_LEN) | (mwl > MAX_MEAN_WORD_LEN)
        ).alias("fail_mean_word_len"),
        (X.alpha_ratio(c) < MIN_ALPHA_RATIO).alias("fail_alpha_ratio"),
        (stop_hits < MIN_STOPWORD_HITS).alias("fail_stopword_hits"),
        (distinct_ratio < MIN_DISTINCT_RATIO).alias("fail_repetition"),
    ]


def gopher_report(
    docs: DataFrame, *, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-``group_col`` rule-failure census: doc count, per-rule fail
    counts, and the count passing EVERY rule — the summary a curation
    run records before deciding thresholds. One scan, one tiny agg."""
    flagged = docs.select(group_col, *gopher_flags(text_col))
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for name in RULE_NAMES:
        aggs.append(
            F.sum(F.when(F.col(f"fail_{name}"), 1).otherwise(0))
            .cast("long")
            .alias(f"n_fail_{name}")
        )
    pass_expr = F.lit(True)
    for name in RULE_NAMES:
        pass_expr = pass_expr & ~F.col(f"fail_{name}")
    aggs.append(
        F.sum(F.when(pass_expr, 1).otherwise(0)).cast("long").alias("n_pass_all")
    )
    return flagged.groupBy(group_col).agg(*aggs).orderBy(group_col)
