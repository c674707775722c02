"""Character-level BPE learner: the classic Sennrich worked example,
weighted-argmax tie-breaks, segmentation replay, and the batched
(top-B symbol-disjoint) merge rounds (VERDICT r9 #1)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.bpe import (
    learn_bpe,
    segmentation,
    select_merge_batch,
    word_vocab,
)


def _corpus(spark):
    # Sennrich et al. 2016 §3.2 word frequencies:
    # low:5 lower:2 newest:6 widest:3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


@pytest.mark.slow
def test_learn_bpe_matches_hand_derivation(spark):
    docs = _corpus(spark)
    merges = learn_bpe(docs, m=5)
    # round 1: 'e s' (newest 6 + widest 3 = 9) ties 's t' (9) -> (a,b) asc
    # round 2: 'es t' 9; round 3: 'est </w>' 9
    # round 4: 'l o' (5+2=7) ties 'o w' (7) -> 'l o' first; round 5: 'lo w' 7
    assert merges == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "est", "</w>", 9),
        (4, "l", "o", 7),
        (5, "lo", "w", 7),
    ]


def test_segmentation_replays_merges(spark):
    docs = _corpus(spark)
    merges = learn_bpe(docs, m=5)
    seg = {r["word"]: (list(r["pieces"]), r["n_pieces"], r["cnt"])
           for r in segmentation(docs, merges).collect()}
    assert seg["low"] == (["low", "</w>"], 2, 5)
    assert seg["lower"] == (["low", "e", "r", "</w>"], 4, 2)
    assert seg["newest"] == (["n", "e", "w", "est</w>"], 4, 6)
    assert seg["widest"] == (["w", "i", "d", "est</w>"], 4, 3)


def test_word_vocab_is_the_single_corpus_pass(spark):
    docs = _corpus(spark)
    v = {r["word"]: r["cnt"] for r in word_vocab(docs).collect()}
    assert v == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def _segregated_corpus(spark):
    """Three letter-disjoint word groups whose top pairs (a,b)=100,
    (c,d)=90, (e,f)=80 strictly dominate every other pair (all <= 34)
    AND every pair adjacent to them — the regime where batched and
    sequential BPE provably agree (created-pair counts are bounded by
    round-start adjacency counts; see select_merge_batch docstring)."""
    words = (
        ["uabq"] * 34 + ["vabr"] * 33 + ["wabs"] * 33
        + ["gcdh"] * 30 + ["icdj"] * 30 + ["kcdl"] * 30
        + ["mefn"] * 27 + ["oefp"] * 27 + ["xefy"] * 26
    )
    return spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")


def test_batched_learner_matches_sequential_where_provably_equal(spark):
    docs = _segregated_corpus(spark)
    seq = learn_bpe(docs, m=3, batch=1)
    bat = learn_bpe(docs, m=3, batch=3)
    assert seq == bat
    assert [(a, b, n) for _, a, b, n in bat] == [
        ("a", "b", 100),
        ("c", "d", 90),
        ("e", "f", 80),
    ]


def test_batched_learner_caps_total_merges_at_m(spark):
    docs = _corpus(spark)
    merges = learn_bpe(docs, m=5, batch=4)
    assert len(merges) == 5
    assert [r for r, _, _, _ in merges] == [1, 2, 3, 4, 5]
    # batch=1 path is byte-identical to the classic learner
    assert learn_bpe(docs, m=5, batch=1) == learn_bpe(docs, m=5)


def test_batched_segmentation_is_consistent_with_its_own_merges(spark):
    # whatever order the batched learner records, segmentation replay
    # must reproduce a valid tokenization: pieces re-concatenate to the
    # word + EOW for every vocab entry
    docs = _corpus(spark)
    merges = learn_bpe(docs, m=6, batch=3)
    for r in segmentation(docs, merges).collect():
        assert "".join(r["pieces"]) == r["word"] + "</w>"


def test_select_merge_batch_rejects_bad_batch():
    with pytest.raises(ValueError):
        select_merge_batch([("a", "b", 3)], 0)


_pairs = st.lists(
    st.tuples(
        st.text(alphabet="abcdef", min_size=1, max_size=2),
        st.text(alphabet="abcdef", min_size=1, max_size=2),
        st.integers(min_value=1, max_value=100),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=200, deadline=None)
@given(pairs=_pairs, batch=st.integers(min_value=1, max_value=8))
def test_select_merge_batch_properties(pairs, batch):
    # canonical ranking the learner feeds it: (n desc, a asc, b asc),
    # deduplicated on (a, b) like a groupBy output
    seen = set()
    ranked = []
    for a, b, n in sorted(pairs, key=lambda p: (-p[2], p[0], p[1])):
        if (a, b) not in seen:
            seen.add((a, b))
            ranked.append((a, b, n))
    kept = select_merge_batch(ranked, batch)
    # size bound and batch=1 degenerates to the argmax
    assert 1 <= len(kept) <= batch
    assert select_merge_batch(ranked, 1) == [ranked[0]]
    # kept is a subsequence of the ranked order (frequency-greedy)
    idx = [ranked.index(p) for p in kept]
    assert idx == sorted(idx)
    # pairwise symbol-disjoint
    for i, (a1, b1, _) in enumerate(kept):
        for a2, b2, _ in kept[i + 1 :]:
            assert not ({a1, b1} & {a2, b2})
    # greedy maximality: any ranked pair skipped before the batch
    # filled shares a symbol with an earlier kept pair
    if len(kept) < batch:
        used = set()
        ki = iter(kept)
        nxt = next(ki, None)
        for p in ranked:
            if p == nxt:
                used |= {p[0], p[1]}
                nxt = next(ki, None)
            else:
                assert p[0] in used or p[1] in used
