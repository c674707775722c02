"""Exact stratified train/test split — sklearn ``train_test_split(...,
stratify=y)`` parity (LP.ipynb:812-818 cell 20), distributed.

Per-class shuffle via a seeded ``xxhash64`` of the full row content +
``row_number`` against the per-class count: train gets
ceil((1-test_size)·n_class) rows of every class, so class proportions are
preserved to within one row — ``randomSplit`` only approximates this in
expectation.

Membership is a pure function of (row content, seed): unlike
``rand(seed)`` + ``monotonically_increasing_id`` (partition-layout
dependent, recomputed per action), the hash ordering survives task retry,
AQE re-planning, and upstream repartitioning, so a row can never land in
both splits across the separately-executed train-fit and test-transform
jobs. Identical duplicate rows tie on the hash and are assigned
arbitrarily among themselves — interchangeable, so the train/test
*multisets* are still deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import Window as W


def stratified_split(
    df: DataFrame,
    label_col: str,
    test_size: float = 0.2,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    row_hash = F.xxhash64(
        F.lit(seed),
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x00<null>")) for c in df.columns],
    )
    w_order = W.partitionBy(label_col).orderBy(row_hash)
    w_class = W.partitionBy(label_col)
    flagged = (
        df.withColumn("__rn", F.row_number().over(w_order))
        .withColumn("__n", F.count(F.lit(1)).over(w_class))
        .withColumn(
            "__train", F.col("__rn") <= F.ceil(F.col("__n") * F.lit(1.0 - test_size))
        )
    )
    train = flagged.where(F.col("__train")).drop("__rn", "__n", "__train")
    test = flagged.where(~F.col("__train")).drop("__rn", "__n", "__train")
    return train, test
