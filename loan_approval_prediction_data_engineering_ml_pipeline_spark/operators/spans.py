"""Span-level corpus cleaning: the two classic sub-document dedup passes
every large-scale LLM training-data pipeline runs AFTER document-level
dedup (the reference repo stops at whole-row ``drop_duplicates``;
these extend that intent to the granularity modern corpus work needs —
reference parity target: LP.ipynb's dedup cell, generalized):

- :func:`remove_boilerplate_lines` — CCNet / RefinedWeb line-level
  dedup: a line occurring (normalized) in many documents is template
  boilerplate (nav bars, cookie banners, license headers) and is
  removed from EVERY document, preserving the remaining lines in order.
- :func:`remove_duplicate_spans` — Lee et al. 2022 ("Deduplicating
  Training Data Makes Language Models Better") exact substring dedup,
  in its standard scalable fixed-window form: any ``window``-token
  sequence occurring ``min_occurrences``+ times across the corpus is a
  duplicated span; every occurrence except one global keeper is cut
  from its document. Overlapping duplicate windows chain, so a repeated
  span of ANY length >= window is removed whole, which is exactly the
  suffix-array semantics of the paper at token granularity (the paper's
  suffix array finds variable-length matches; the fixed-window variant
  is the distributed approximation used in practice because window
  hashes shard where suffix arrays do not).

Everything is built-in DataFrame ops — explode / window / anti-join /
ordered re-assembly — no Python UDFs, so the whole pass stays in
whole-stage codegen and scales with corpus token count:

- line pass: one shuffle keyed on the normalized line (the frequency
  count) + one anti-join + one groupBy(doc) rebuild. Blank lines are
  never counted and never removed — they'd be the classic hot key (every
  document contributes them) and removing them destroys paragraph
  structure; skipping them is also what CCNet does.
- span pass: token explode is O(corpus tokens) — the cost any tokenizer
  pass already pays; window hashes shuffle ONCE on the 8-byte hash;
  the removal set explodes window→positions only for DUPLICATED
  windows (bounded by duplicate mass, not corpus size); rebuild is one
  groupBy(doc). Per-task memory is bounded by document length (the
  collect_list rebuild), the same bound chunking already assumes.

At 100 TB: both passes are shuffle-bounded by corpus token count with
no driver-side state at all; the only skew risks (blank/empty lines,
degenerate repeated tokens) are excluded from the keyed shuffle by
construction. Window hashing uses md5-derived 64-bit keys so the DuckDB
oracle can re-derive them bit-identically (same discipline as MinHash in
``plans/llm_data.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from ..functions.parallel import ensure_cpu_parallelism


def _rebuild(
    docs: DataFrame,
    kept: DataFrame,
    id_col: str,
    text_col: str,
    separator: str,
    pos_col: str = "__pos",
    part_col: str = "__part",
) -> DataFrame:
    """Reassemble kept (id, pos, part) fragments into documents in
    original order; documents that lost every fragment come back with
    empty text (LEFT join to the original ids), other columns carried."""
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(pos_col, part_col))),
                lambda s: s[part_col],
            ),
            separator,
        ).alias(text_col)
    )
    return (
        docs.drop(text_col)
        .join(rebuilt, id_col, "left")
        .fillna({text_col: ""})
        .select(*docs.columns)
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    separator: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """Line-level corpus dedup (CCNet §4.1 / RefinedWeb line-wise
    filtering): drop every line whose normalized form (trim + lowercase
    when ``normalize``) occurs in at least ``min_docs`` DISTINCT
    documents; surviving lines keep their original order and text.
    Blank lines are exempt — never counted toward boilerplate, never
    removed (hot-key avoidance + paragraph structure, see module doc).
    ``separator`` is a regex (default real newlines; pass ``" "`` for
    single-line corpora to get corpus-stopword removal — the degenerate
    form the parity gate exercises on the synthetic documents table).
    """
    # NB: no scan spread (r17): line split+explode into a partial
    # aggregation is shuffle-bound, not map-CPU-bound — measured +0.53 s
    # with the added exchange at sf0.1
    lines = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), separator, -1)).alias(
            "__pos", "__part"
        ),
    )
    norm = F.trim("__part")
    if normalize:
        norm = F.lower(norm)
    lines = lines.withColumn("__norm", norm)
    boiler = (
        lines.where(F.col("__norm") != "")
        .groupBy("__norm")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__norm")
    )
    kept = lines.alias("l").join(
        boiler.alias("b"),
        (F.col("l.__norm") == F.col("b.__norm")) & (F.col("l.__norm") != ""),
        "left_anti",
    )
    return _rebuild(docs, kept, id_col, text_col, separator)


def remove_duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    min_occurrences: int = 2,
) -> DataFrame:
    """Exact substring dedup (Lee et al. 2022, fixed-window variant):
    cut every occurrence-but-one of any ``window``-token sequence seen
    ``min_occurrences``+ times corpus-wide. The keeper is the globally
    first occurrence — minimal ``(doc_id, position)`` per window hash,
    via row_number, so the result is deterministic under any partitioning
    and identically derivable in SQL. Tokens are whitespace-split and the
    rebuild joins with single spaces (token-level fidelity; original
    inter-token whitespace is not preserved — the same contract as every
    tokenize→detokenize pass). Documents shorter than ``window`` tokens
    are never touched; a document that was entirely duplicated spans
    comes back empty rather than vanishing."""
    toks = ensure_cpu_parallelism(docs).select(
        id_col,
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+", -1)).alias(
            "__pos", "__part"
        ),
    ).where(F.col("__part") != "")
    seq = Window.partitionBy(id_col).orderBy("__pos").rowsBetween(
        0, window - 1
    )
    grams = (
        toks.withColumn("__win", F.collect_list("__part").over(seq))
        .where(F.size("__win") == window)
        # md5-derived 64-bit key: bit-identical in the DuckDB oracle
        # (xxhash64 would be Spark-only); 60 bits of md5 — collisions
        # would only ever REMOVE a false extra span, and at 2^-60 per
        # pair they are beyond corpus scale.
        .select(
            id_col,
            "__pos",
            F.conv(F.substring(F.md5(F.array_join("__win", " ")), 1, 15), 16, 10)
            .cast("long")
            .alias("__h"),
        )
    )
    byh = Window.partitionBy("__h")
    marked = grams.withColumn("__n", F.count(F.lit(1)).over(byh)).withColumn(
        "__rn",
        F.row_number().over(byh.orderBy(id_col, "__pos")),
    )
    drop_positions = (
        marked.where(
            (F.col("__n") >= min_occurrences) & (F.col("__rn") > 1)
        )
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + (window - 1))
            ).alias("__pos"),
        )
        .distinct()
    )
    kept = toks.join(drop_positions, [id_col, "__pos"], "left_anti")
    return _rebuild(docs, kept, id_col, text_col, " ")
