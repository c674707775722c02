"""Byte-pair-encoding tokenizer training (Sennrich, Haddow & Birch 2016)
— the vocabulary-learning pass an LLM data pipeline runs BEFORE token
counting, packing, or any token-budgeted selection makes sense.

Reference parity note: the reference repo (LP.ipynb / MY.ipynb) is a
loan-ML notebook with no text surface — this belongs to the
beyond-reference training-data operators the brief mandates.

The algorithm is the classic one: each word becomes a symbol sequence
(characters + a ``</w>`` end-of-word marker); every round merges the
most frequent ADJACENT symbol pair — weighted by word frequency — into
one symbol, corpus-wide. What makes it scale is Sennrich's own
observation, kept intact here: pair statistics only depend on the
WORD-FREQUENCY VOCABULARY, not the corpus. So:

- **One corpus pass** builds ``(word, cnt)`` — an explode + count
  shuffle whose width is the distinct-word vocabulary (~10^7-10^8 rows
  at 100 TB, thousands of times smaller than the corpus).
- **Every merge round runs over the vocab relation**: pair counting is
  a map-only index transform + one partially-aggregated (a, b) shuffle
  over vocab rows weighted by ``cnt``; the argmax is a 1-row collect;
  the merge is a map-only string replace. Round cost is O(vocab), not
  O(corpus) — the property that makes thousands-of-merges tokenizer
  training tractable as a sequence of tiny Spark jobs.
- **Applying the tokenizer is one more corpus pass**: the final vocab
  carries each word's segmentation, so tokenizing = explode words +
  broadcast-join the word→pieces map (or ship it to any runtime — the
  merge list IS the tokenizer artifact).

The merge-apply step is a literal left-to-right non-overlapping string
``replace`` on the space-joined symbol string — identical semantics in
Spark and DuckDB, so the whole ITERATIVE learner re-derives in chained
SQL CTEs exactly like the word2phrase loop (``plans/llm_data.py``).
Shared caveat (documented there too): occurrences overlapping on the
boundary space (`` a a a ``) merge once per round, deferring the next
occurrence to a later round — on both engines equally.

Determinism: argmax ties break on (a, b) ascending, so the learned
merge table is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as X

EOW = "</w>"  #: end-of-word marker (Sennrich's convention)


def word_vocab(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """``(word, cnt)`` — the one corpus-sized pass BPE needs."""
    toks = F.filter(X.tokens(text_col), lambda t: t != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _symbolized(vocab: DataFrame) -> DataFrame:
    """Vocab rows as bracketed symbol strings: ``" h e l l o </w> "``."""
    return vocab.select(
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", F.split(F.col("word"), "")),
            F.lit(f" {EOW} "),
        ).alias("w"),
        "cnt",
    )


def learn_bpe(
    docs: DataFrame,
    m: int = 8,
    *,
    text_col: str = "text",
    checkpoint_every: int = 16,
) -> list[tuple[int, str, str, int]]:
    """Run ``m`` BPE merge rounds; returns ``[(rank, a, b, weight)]``
    where ``weight`` is the pair's word-frequency-weighted count at the
    time it won. The loop runs entirely over the vocab relation; the
    corpus is scanned exactly once (inside :func:`word_vocab`)."""
    cur = _symbolized(word_vocab(docs, text_col=text_col)).localCheckpoint(
        eager=True  # the single corpus pass — rounds never re-scan it
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, m + 1):
        top = (
            cur.withColumn("__s", F.split(F.trim(F.col("w")), " "))
            .where(F.size("__s") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(__s)-2),"
                        " i -> struct(__s[i] AS a, __s[i+1] AS b))"
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        merges.append((rank, r["a"], r["b"], int(r["n"])))
        cur = cur.select(
            F.replace(
                F.col("w"),
                F.lit(f" {r['a']} {r['b']} "),
                F.lit(f" {r['a']}{r['b']} "),
            ).alias("w"),
            "cnt",
        )
        if checkpoint_every and rank % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)  # vocab-sized, tiny
    return merges


def segmentation(
    docs: DataFrame, merges: list[tuple[int, str, str, int]], *, text_col: str = "text"
) -> DataFrame:
    """``(word, cnt, pieces array<string>, n_pieces)`` — each vocab
    word's segmentation under the learned merge list, derived by
    replaying the merges as one nested map-only replace expression
    (rank order; each merge sees the previous one's output, identical
    to the iterative loop). This frame IS the tokenizer: broadcast-join
    it against exploded corpus words to tokenize at scale."""
    vocab = word_vocab(docs, text_col=text_col)
    expr = F.concat(
        F.lit(" "),
        F.concat_ws(" ", F.split(F.col("word"), "")),
        F.lit(f" {EOW} "),
    )
    for _, a, b, _n in sorted(merges):
        expr = F.replace(expr, F.lit(f" {a} {b} "), F.lit(f" {a}{b} "))
    pieces = F.split(F.trim(expr), " ")
    return vocab.select(
        "word",
        "cnt",
        pieces.alias("pieces"),
        F.size(pieces).alias("n_pieces"),
    )
