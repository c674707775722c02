"""Iterative graph algorithms over edge-list DataFrames.

Spark has no built-in PageRank on DataFrames (GraphX is RDD/Scala-only),
so this is the DataFrame-native power iteration: ranks and edges are
plain DataFrames co-partitioned on the join key, each iteration is one
join + one aggregation, and lineage is cut with ``localCheckpoint``
every round (the same discipline as
``operators.dedup.connected_components`` — without it the per-iteration
scalar actions re-execute the whole un-materialized chain, and the plan
string grows until the driver chokes long before the data hurts; the
(vertex, rank) table being materialized is tiny next to the edge list).

Scale accounting (100 TB / 1000 executors): state per iteration is one
(vertex, rank) row per vertex — the edge list dominates storage and is
scanned once per iteration with the SAME hash partitioning on ``src``
every round, so only the small rank table reshuffles. Convergence is
checked with a 1-row L1-delta aggregate per iteration (a driver scalar,
not a collect of the ranks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """Power-iteration PageRank on a directed edge list.

    Returns (vertex, rank) with ranks summing to ~1. Dangling vertices
    (no out-edges) redistribute their rank uniformly each round, so the
    distribution stays stochastic. Raises if the iteration has not
    converged (L1 delta > ``tol``) after ``max_iter`` rounds — silent
    non-convergence would hand downstream ranking wrong numbers.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("rank", F.lit(0.0))

    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # edges annotated once with the sender's fanout; reused every round
    e_deg = (
        e.join(out_deg, "src")
        .select("src", "dst", "out_deg")
        .localCheckpoint(eager=True)
    )
    # the dangling-vertex set (no out-edges) is static — derive it once,
    # not once per iteration
    dangling_vertices = vertices.join(
        out_deg, vertices.vertex == out_deg.src, "left_anti"
    ).localCheckpoint(eager=True)
    # most cleaned graphs have NO dangling vertices — skip the per-round
    # dangling-mass job entirely in that case
    has_dangling = dangling_vertices.limit(1).count() > 0

    # each iteration runs two scalar actions (dangling mass, delta) plus
    # the next round's join; materialize ranks EVERY round — the
    # (vertex, rank) table is tiny next to the edge list, and without it
    # each action re-executes the un-checkpointed join chain
    ranks = vertices.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    delta = float("inf")

    for _it in range(max_iter):
        # mass sent along edges: rank/out_deg to each neighbor
        contribs = (
            e_deg.join(ranks, e_deg.src == ranks.vertex)
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("recv"))
        )
        # rank mass held by dangling vertices, redistributed uniformly
        dangling = (
            ranks.join(dangling_vertices, "vertex", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
            if has_dangling
            else 0.0
        )
        new_ranks = (
            vertices.join(contribs, vertices.vertex == contribs.dst, "left")
            .select(
                "vertex",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("recv"), F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), F.col("n.vertex") == F.col("o.vertex"))
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .first()[0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            return ranks
    raise RuntimeError(
        f"pagerank did not converge in {max_iter} iterations (L1 delta {delta:.2e} > tol {tol:.0e})"
    )
