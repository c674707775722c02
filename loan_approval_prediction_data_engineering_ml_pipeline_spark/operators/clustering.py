"""Distributed k-means over embedding columns, and the SemDeDup-style
semantic-dedup pipeline built on it.

The reference has no clustering surface; this is part of the
training-data extension set (SemDeDup, Abbas et al. 2023: cluster the
corpus in embedding space, then remove near-duplicates WITHIN each
cluster — pair generation cost drops from O(n^2) to
O(sum cluster_size^2) while catching the same semantic dup mass).

Unlike the MLlib ``KMeans`` used by the ANN index builders
(`similarity.py` — k-means|| init, engine-private tie-breaks), this is
a DETERMINISTIC Lloyd's: first-k-by-id init, fixed iteration count,
centroids rounded to 6 dp after every averaging step, argmin ties to
the smallest cell id. Every step is re-derivable in ANSI SQL, so the
whole iterative algorithm carries a DuckDB oracle (rare for iterative
ML) — see ``kmeans_embed_clusters`` / ``semantic_dedup`` in
``plans/llm_data.py``.

Scale shape (100 TB): centroids are k x d floats — driver/broadcast
size. Each iteration is one map-only Arrow pass for assignment
(vectorized numpy argmin per batch; X·C distances, no Python per-row
hop) plus one partial-aggregated skinny shuffle for the new means
((cell, pos, val) longs/doubles — map-side combine reduces it to
k·d rows per task). No all-pairs step exists; the dedup stage joins
only within clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assign_cells(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: one Arrow-batched map-only pass.
    ``centroids`` is [(cell_id, vector), ...]; ties go to the smallest
    cell id (centroids are scanned in ascending-id order and numpy
    argmin keeps the first minimum)."""
    import numpy as np
    import pandas as pd

    cents = sorted(centroids)
    cell_ids = np.asarray([c for c, _ in cents], dtype=np.int64)
    C = np.asarray([v for _, v in cents], dtype=np.float64)

    def fn(batches):
        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            # per-centroid squared distance, sequential-order sums (the
            # oracle's list_distance sums sequentially; argmin over these
            # only diverges on exact float ties, which quantized
            # centroids make measure-zero)
            d2 = np.stack([((X - C[j]) ** 2).sum(axis=1) for j in range(len(C))], axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "cell": cell_ids[d2.argmin(axis=1)]}
            )

    return emb.select(id_col, vec_col).mapInPandas(fn, f"{id_col} long, cell long")


def lloyd_kmeans(
    emb: DataFrame,
    k: int,
    iters: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Deterministic Lloyd's: init from the k smallest-id vectors (cell
    label = rank in id order, 0-based), run ``iters`` rounds of
    assign -> mean -> round(6 dp). A cell that loses all members is
    dropped (not reseeded) — mirrored by the SQL oracle. Returns the
    final assignment DataFrame (id, cell) and the final centroid list.
    """
    if iters < 1:
        raise ValueError("lloyd_kmeans needs iters >= 1 (assignment comes from the last round)")
    init_rows = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init_rows)]
    cents_for_assign = cents
    for _ in range(iters):
        cents_for_assign = cents
        # mean update WITHOUT shipping vectors anywhere: the SAME Arrow
        # pass that argmins also emits per-batch (cell, pos, sum, count)
        # partials — k·d tiny rows per batch — so the shuffle carries
        # partials, not an n·d posexplode, and no join back to the
        # vectors is needed
        means = (
            _partial_cell_sums(emb, cents, id_col=id_col, vec_col=vec_col)
            .groupBy("cell", "pos")
            # sum/count then round = DuckDB's round(avg, 6): HALF_UP in
            # both engines; quantizing here is what makes iteration t+1
            # start from bit-identical centroids in both
            .agg(F.round(F.sum("s") / F.sum("c"), 6).alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        cents = [
            (cell, [vals[p] for p in sorted(vals)]) for cell, vals in sorted(by_cell.items())
        ]
    # the returned pair is self-consistent: assignment under the
    # second-to-last centroids, centroids = means OF that assignment
    # (a3/c3 in the oracle CTE chain). Checkpointed: callers feed it to
    # further jobs (pair GEMM, counts) and must not re-run the Arrow
    # argmin per downstream action.
    assign = assign_cells(emb, cents_for_assign, id_col=id_col, vec_col=vec_col)
    return assign.localCheckpoint(eager=True), cents


def _partial_cell_sums(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """One Arrow pass fusing the E-step and the M-step's partial
    aggregation: per batch, argmin-assign, then emit (cell, pos,
    sum-of-dim, count) for each non-empty cell."""
    import numpy as np
    import pandas as pd

    cents = sorted(centroids)
    cell_ids = np.asarray([c for c, _ in cents], dtype=np.int64)
    C = np.asarray([v for _, v in cents], dtype=np.float64)

    def fn(batches):
        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            d = X.shape[1]
            a = np.stack(
                [((X - C[j]) ** 2).sum(axis=1) for j in range(len(C))], axis=1
            ).argmin(axis=1)
            cells, poss, sums, cnts = [], [], [], []
            for ci in np.unique(a):
                mask = a == ci
                cells.append(np.full(d, cell_ids[ci]))
                poss.append(np.arange(d, dtype=np.int32))
                sums.append(X[mask].sum(axis=0))
                cnts.append(np.full(d, int(mask.sum()), dtype=np.int64))
            yield pd.DataFrame(
                {
                    "cell": np.concatenate(cells),
                    "pos": np.concatenate(poss),
                    "s": np.concatenate(sums),
                    "c": np.concatenate(cnts),
                }
            )

    return emb.select(vec_col).mapInPandas(fn, "cell long, pos int, s double, c long")
