"""Iterative phrase-vocabulary learning (word2phrase / BPE-style merge
loop) over the documents table.

Each round counts adjacent-token pairs across the corpus, merges the
most frequent pair into a single ``w1@@w2`` token everywhere, and
repeats — later rounds can merge merged tokens, growing multiword
phrases (Mikolov et al. 2013's word2phrase; the same merge loop BPE
runs at character level). The merge-apply step is a literal string
``replace`` on the space-joined document, which is LEFT-TO-RIGHT
NON-OVERLAPPING in both Spark and DuckDB — exactly BPE's greedy merge
semantics — so the whole iterative algorithm is re-derivable in chained
SQL CTEs (see ``phrase_merges`` in ``plans/llm_data.py``), like the
Lloyd's k-means oracle.

Scale shape: pair counting is map-only (index transform + explode — no
window, no self-join) into one partially-aggregated (w1, w2) shuffle
per round; the argmax is a 1-row collect; the merge is a map-only
projection chained onto the next round's scan. At 100 TB you would
count pairs on a deterministic hash sample (``mixture_sample``'s
md5-threshold recipe) and apply merges to the full corpus once at the
end; the fixture-scale query counts exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def learn_phrase_merges(
    docs: DataFrame, m: int = 6, *, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Run ``m`` merge rounds; returns [(rank, w1, w2, pair_count)].
    Argmax ties break on (w1, w2) ascending — mirrored by the oracle."""
    cur = docs.select(
        F.concat(F.lit(" "), F.trim(F.col(text_col)), F.lit(" ")).alias("w")
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, m + 1):
        toks = F.split(F.trim(F.col("w")), " ")
        top = (
            cur.withColumn("__toks", toks)
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
    return merges
