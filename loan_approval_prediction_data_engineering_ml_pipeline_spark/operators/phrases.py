"""Iterative phrase-vocabulary learning (word2phrase / BPE-style merge
loop) over the documents table.

Each round counts adjacent-token pairs across the corpus, merges the
most frequent pair into a single ``w1@@w2`` token everywhere, and
repeats — later rounds can merge merged tokens, growing multiword
phrases (Mikolov et al. 2013's word2phrase; the same merge loop BPE
runs at character level). The merge-apply step is a literal string
``replace`` on the space-joined document, which is LEFT-TO-RIGHT
NON-OVERLAPPING in both Spark and DuckDB — so the whole iterative
algorithm is re-derivable in chained SQL CTEs (see ``phrase_merges`` in
``plans/llm_data.py``), like the Lloyd's k-means oracle. One semantic
caveat vs true BPE: adjacent occurrences that share a boundary space
(`` a b a b ``) overlap on the delimiter, so only the first merges that
round and the second defers to a later round — merge COUNTS per round
can therefore differ from a character-level BPE even though the learned
merge ranking agrees on non-overlapping text (Spark and DuckDB agree
exactly, which is what the oracle checks).

Scale shape: pair counting is map-only (index transform + explode — no
window, no self-join) into one partially-aggregated (w1, w2) shuffle
per round; the argmax is a 1-row collect; the merge is a map-only
projection chained onto the next round's scan. Two knobs make the loop
viable beyond fixture scale:

- ``sample_rate``: count pairs on a deterministic md5-threshold content
  sample (``mixture_sample``'s recipe — reproducible across runs,
  partitionings, and task retries, unlike ``rand()``), then apply the
  learned merges to the full corpus ONCE via
  :func:`apply_phrase_merges`. Pair frequencies are uniform-sample
  estimates, so top-rank merges are preserved with high probability
  while each round scans rate·corpus.
- ``checkpoint_every``: the merge projection chains onto an
  uncheckpointed plan, so round *i* would re-execute *i−1* replaces
  from the scan and lineage grows O(m) (fine at m=6; pathological at
  BPE-like m in the thousands). Every N rounds the working frame is
  localCheckpoint'ed, bounding both lineage depth and re-execution to N
  rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..functions.parallel import ensure_cpu_parallelism


def _content_sample(df: DataFrame, rate: float) -> DataFrame:
    """Deterministic ~rate sample keyed on a content hash of the working
    text: first 8 md5 hex digits as a uniform u ∈ [0,1) compared against
    the rate (the ``mixture_sample`` recipe) — a map-side filter, stable
    under repartitioning and task retries."""
    u = (
        F.conv(F.substring(F.md5(F.col("w").cast("binary")), 1, 8), 16, 10).cast(
            "double"
        )
        / 4294967296.0
    )
    return df.where(u < F.lit(rate))


def learn_phrase_merges(
    docs: DataFrame,
    m: int = 6,
    *,
    text_col: str = "text",
    sample_rate: float | None = None,
    checkpoint_every: int | None = None,
) -> list[tuple[int, str, str, int]]:
    """Run ``m`` merge rounds; returns [(rank, w1, w2, pair_count)].
    Argmax ties break on (w1, w2) ascending — mirrored by the oracle.

    ``sample_rate`` counts each round's pairs on a deterministic content
    sample (counts are then sample counts, not corpus counts);
    ``checkpoint_every`` localCheckpoints the working frame every N
    rounds to bound lineage depth for large ``m``."""
    # NB: no scan spread (r17): rounds 1..checkpoint_every re-execute the
    # input lineage per round, so an added exchange is paid per round —
    # measured +0.95 s over the 6-round loop at sf0.1
    cur = docs.select(
        F.concat(F.lit(" "), F.trim(F.col(text_col)), F.lit(" ")).alias("w")
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, m + 1):
        counted = cur if sample_rate is None else _content_sample(cur, sample_rate)
        toks = F.split(F.trim(F.col("w")), " ")
        top = (
            counted.withColumn("__toks", toks)
            .where(F.size("__toks") >= 2)  # sequence(0,-1) would DESCEND
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(__toks)-2),"
                        " i -> struct(__toks[i] AS w1, __toks[i+1] AS w2))"
                    )
                ).alias("p")
            )
            .groupBy("p.w1", "p.w2")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        merges.append((rank, r["w1"], r["w2"], r["n"]))
        cur = cur.select(
            F.replace(
                F.col("w"),
                F.lit(f" {r['w1']} {r['w2']} "),
                F.lit(f" {r['w1']}@@{r['w2']} "),
            ).alias("w")
        )
        if checkpoint_every and rank % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    return merges


def apply_phrase_merges(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    *,
    text_col: str = "text",
    out_col: str = "text_merged",
) -> DataFrame:
    """Apply a learned merge list to the full corpus in ONE map-only
    projection: the replaces nest in rank order inside a single
    expression (replace(replace(w, m1), m2)…), so each merge is applied
    corpus-wide before the next sees the text — identical semantics to
    the iterative loop's per-round projections, at the cost of a single
    scan. This is the 100 TB shape: learn on a sample, apply once."""
    expr = F.concat(F.lit(" "), F.trim(F.col(text_col)), F.lit(" "))
    for _, w1, w2, _ in sorted(merges):
        expr = F.replace(expr, F.lit(f" {w1} {w2} "), F.lit(f" {w1}@@{w2} "))
    return docs.withColumn(out_col, F.trim(expr))
