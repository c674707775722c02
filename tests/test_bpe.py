"""Character-level BPE learner: the classic Sennrich worked example,
weighted-argmax tie-breaks, and segmentation replay."""

from __future__ import annotations

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.bpe import (
    learn_bpe,
    segmentation,
    word_vocab,
)


def _corpus(spark):
    # Sennrich et al. 2016 §3.2 word frequencies:
    # low:5 lower:2 newest:6 widest:3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


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
