"""PII detection/redaction: pattern semantics, redaction order, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from loan_approval_prediction_data_engineering_ml_pipeline_spark.operators import pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii.redact_pii(df).collect()[0]


def test_each_class_detected_and_redacted(spark):
    r = _one(
        spark,
        "mail a.user+tag@sub.example.co.uk ip 10.0.255.7 call 415-555-0134 "
        "ssn 123-45-6789 card 4111-1111-1111-1111 done",
    )
    assert (r["n_email"], r["n_ipv4"], r["n_phone"], r["n_ssn"], r["n_cc"]) == (
        1, 1, 1, 1, 1,
    )
    assert r["text"] == (
        "mail <EMAIL> ip <IP> call <PHONE> ssn <SSN> card <CREDIT_CARD> done"
    )


def test_credit_card_not_half_eaten_by_phone_rule(spark):
    # CC redacts before SSN/phone; and the narrower digit rules must not
    # match inside a card number measured on the raw text either
    r = _one(spark, "pay 4111-1111-1111-1111 now")
    assert r["n_cc"] == 1 and r["n_phone"] == 0 and r["n_ssn"] == 0
    assert r["text"] == "pay <CREDIT_CARD> now"


def test_counts_measured_on_raw_text_not_redaction_residue(spark):
    # an email whose domain looks like it could leave digits behind:
    # counts reflect the ORIGINAL text per class, independent of order
    r = _one(spark, "x 192.168.1.1 y user@h2.example.com z")
    assert r["n_ipv4"] == 1 and r["n_email"] == 1
    assert r["text"] == "x <IP> y <EMAIL> z"


def test_clean_text_untouched(spark):
    r = _one(spark, "plain words only no identifiers here")
    assert r["text"] == "plain words only no identifiers here"
    assert all(r[f"n_{n}"] == 0 for n, _, _ in pii.PII_RULES)


def test_redaction_is_map_only(spark):
    """The scrub must stay a single map-only projection: no Exchange,
    no Python workers — at 100 TB the pass costs exactly the text scan."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("u"), F.col("id").cast("string"), F.lit("@a.io")).alias("text"),
    )
    plan = pii.redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan  # zero UDFs: all JVM regexp expressions


def test_redaction_idempotent_and_residual_free_on_fuzz_corpus(spark):
    """One batch of 150 seeded fuzz strings mixing every PII class with
    word soup: (1) placeholders never re-match (redact∘redact ==
    redact — placeholders carry no digits/@/separators), (2) the
    realistic corpus redacts residual-free (re-counting every class on
    the redacted text finds nothing)."""
    import random

    rng = random.Random(42)
    words = ["alpha", "beta", "ip", "mail", "x1", "42", "a.b", "-", "dot."]
    def frag():
        kind = rng.randrange(8)
        if kind == 0:
            return f"user{rng.randrange(99)}@h{rng.randrange(9)}.example.com"
        if kind == 1:
            return f"{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}.{rng.randrange(256)}"
        if kind == 2:
            return f"{rng.randrange(100,999)}-{rng.randrange(100,999)}-{rng.randrange(1000,9999)}"
        if kind == 3:
            return f"{rng.randrange(100,999)}-{rng.randrange(10,99)}-{rng.randrange(1000,9999)}"
        if kind == 4:
            return "4111-1111-1111-" + str(rng.randrange(1000, 9999))
        return rng.choice(words)

    rows = [(i, " ".join(frag() for _ in range(rng.randrange(3, 12))))
            for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = pii.redact_pii(df, with_counts=False)
    twice = pii.redact_pii(once, with_counts=False)
    residual = once.select("doc_id", *pii.pii_counts("text")).collect()
    assert all(
        all(r[f"n_{name}"] == 0 for name, _, _ in pii.PII_RULES) for r in residual
    )
    a = {r["doc_id"]: r["text"] for r in once.collect()}
    b = {r["doc_id"]: r["text"] for r in twice.collect()}
    assert a == b
