"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo
``amikoshimrah/Loan-Approval-Prediction-Data-Engineering-ML-Pipeline``.

The reference is an eager single-process pandas + sklearn + MySQL pipeline
(see SURVEY.md). This engine re-expresses every capability Spark-first:

- ``sources``    — schema-checked readers and upsert-semantics writers
                   (reference: MY.ipynb cells 1-15, JSON-lines → MySQL).
- ``functions``  — scalar cleaning/text/vector expressions, all built from
                   ``pyspark.sql.functions`` so they stay inside Catalyst
                   whole-stage codegen (reference: clean_df, app.py:42-50).
- ``operators``  — the relational + LLM-data-pipeline operator library
                   (joins, audits, dedup, similarity search, multimodal).
- ``plans``      — the named query registry wired into __spark_entry__
                   with DuckDB oracle twins for the correctness gate.
- ``streaming``  — Structured Streaming ops over the events table.
- ``ml``         — MLlib pipeline mirroring the reference's sklearn
                   Pipeline (LP.ipynb cells 17-22) with parity shims.

Everything is lazy DataFrame-in / DataFrame-out: the logical plan is
declared, Catalyst + Tungsten pick the physical strategy, and the same
code path scales from the sf0.001 fixtures to a 1000-executor cluster.
"""

__version__ = "0.1.0"
