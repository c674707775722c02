"""Span-level corpus cleaning: line-level boilerplate dedup (CCNet /
RefinedWeb) and exact substring dedup (Lee et al. 2022 fixed-window
form) — operators/spans.py."""

import random

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators.spans import (
    remove_boilerplate_lines,
    remove_duplicate_spans,
)


def _texts(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


# ---------------------------------------------------------------------------
# line-level boilerplate removal
# ---------------------------------------------------------------------------

BOILER = "Subscribe to our newsletter"


def test_boilerplate_lines_removed_everywhere_order_preserved(spark):
    docs = spark.createDataFrame(
        [
            (0, f"intro zero\n{BOILER}\nbody zero", "web"),
            (1, f"{BOILER.upper()}  \nbody one\nunique line one", "web"),
            (2, f"body two\n  {BOILER.lower()}", "pdf"),
            (3, "body three only", "pdf"),
        ],
        ["doc_id", "text", "source"],
    )
    out = remove_boilerplate_lines(docs, min_docs=3)
    got = _texts(out)
    # normalized (trim+lower) variants all count toward one line -> 3 docs
    assert got[0] == "intro zero\nbody zero"
    assert got[1] == "body one\nunique line one"
    assert got[2] == "body two"
    assert got[3] == "body three only"
    # non-text columns carried through
    assert {r["source"] for r in out.collect()} == {"web", "pdf"}
    # below threshold: nothing happens
    assert _texts(remove_boilerplate_lines(docs, min_docs=4)) == _texts(docs)


def test_boilerplate_blank_lines_exempt_and_all_boiler_doc_empties(spark):
    docs = spark.createDataFrame(
        [
            (0, "same\n\nkeep zero"),
            (1, "same\n\nkeep one"),
            (2, "same"),  # nothing but boilerplate -> empty, not missing
        ],
        ["doc_id", "text"],
    )
    out = _texts(remove_boilerplate_lines(docs, min_docs=3))
    # blank line never counted (appears in 2 docs) and never removed
    assert out == {0: "\nkeep zero", 1: "\nkeep one", 2: ""}


def test_boilerplate_normalize_false_is_case_sensitive(spark):
    docs = spark.createDataFrame(
        [(0, "Dup\nkeep a"), (1, "dup\nkeep b"), (2, "Dup\nkeep c")],
        ["doc_id", "text"],
    )
    got = _texts(remove_boilerplate_lines(docs, min_docs=2, normalize=False))
    assert got == {0: "keep a", 1: "dup\nkeep b", 2: "keep c"}


# ---------------------------------------------------------------------------
# exact substring (fixed-window) dedup
# ---------------------------------------------------------------------------


def _py_remove_duplicate_spans(corpus, window, min_occurrences=2):
    """Brute-force twin: every window-token gram, global counts, keeper =
    first (doc_id, pos), cut covered positions of non-keepers."""
    toks = {d: t.split() for d, t in corpus.items()}
    occ = {}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(len(ts) - window + 1):
            occ.setdefault(tuple(ts[p : p + window]), []).append((d, p))
    drop = {d: set() for d in toks}
    for gram, sites in occ.items():
        if len(sites) >= min_occurrences:
            for d, p in sorted(sites)[1:]:
                drop[d].update(range(p, p + window))
    return {
        d: " ".join(t for i, t in enumerate(ts) if i not in drop[d])
        for d, ts in toks.items()
    }


def test_duplicate_span_cut_from_all_but_first(spark):
    span = " ".join(f"s{i}" for i in range(25))  # 25 tokens > window
    docs = spark.createDataFrame(
        [
            (0, f"alpha beta {span} gamma"),
            (1, f"one two three {span}"),
            (2, f"{span} tail0 tail1"),
            (3, "no shared content here at all"),
        ],
        ["doc_id", "text"],
    )
    got = _texts(remove_duplicate_spans(docs, window=20))
    assert got[0] == f"alpha beta {span} gamma"  # keeper: first occurrence
    assert got[1] == "one two three"
    assert got[2] == "tail0 tail1"
    assert got[3] == "no shared content here at all"


def test_duplicate_span_within_one_document(spark):
    span = " ".join(f"s{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, f"{span} mid0 mid1 {span}"), (1, "unrelated words only")],
        ["doc_id", "text"],
    )
    got = _texts(remove_duplicate_spans(docs, window=20))
    assert got[0] == f"{span} mid0 mid1"
    assert got[1] == "unrelated words only"


def test_short_docs_untouched_and_fully_duplicated_doc_empties(spark):
    span = " ".join(f"s{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, f"{span} extra"), (1, span), (2, "tiny doc")],
        ["doc_id", "text"],
    )
    got = _texts(remove_duplicate_spans(docs, window=20))
    assert got[0] == f"{span} extra"
    assert got[1] == ""  # entirely a duplicated span, keeper is doc 0
    assert got[2] == "tiny doc"


def test_duplicate_spans_match_bruteforce_on_random_corpora(spark):
    """Seeded random corpora over a tiny vocabulary (forces long shared
    runs) must match the brute-force Python twin exactly — including
    chained overlapping windows extending spans beyond the window size."""
    rng = random.Random(42)
    for trial in range(3):
        vocab = [f"w{i}" for i in range(4 + trial)]
        corpus = {}
        shared = " ".join(rng.choice(vocab) for _ in range(12))
        for d in range(8):
            words = [rng.choice(vocab) for _ in range(rng.randrange(5, 40))]
            if rng.random() < 0.6:  # plant a shared run
                at = rng.randrange(0, len(words))
                words[at:at] = shared.split()
            corpus[d] = " ".join(words)
        window = 8
        expect = _py_remove_duplicate_spans(corpus, window)
        docs = spark.createDataFrame(
            sorted(corpus.items()), ["doc_id", "text"]
        )
        got = _texts(remove_duplicate_spans(docs, window=window))
        assert got == expect, f"trial {trial}"
