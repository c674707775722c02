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
size. Each round is ONE map-only Arrow pass fusing the E-step with the
M-step's partial aggregation (vectorized numpy argmin per batch, then
per-batch (cell, pos, sum, count) partials — k·d tiny rows per batch),
so the shuffle carries partials, never vectors, and no join back to
the corpus exists. The final round's pass also emits the assignment
rows, so the total cost is exactly ``iters`` passes over the corpus.
The dedup stage joins only within clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _centroid_arrays(centroids: list[tuple[int, list[float]]]):
    """Shared E-step prep: ascending-cell-id order so numpy argmin's
    first-minimum tie-break lands on the smallest cell id — the same
    tie-break the oracle's ORDER BY dist, cell LIMIT 1 applies."""
    import numpy as np

    cents = sorted(centroids)
    cell_ids = np.asarray([c for c, _ in cents], dtype=np.int64)
    C = np.asarray([v for _, v in cents], dtype=np.float64)
    return cell_ids, C


def _argmin_cells(X, C):
    """Per-centroid squared distances with sequential-order sums (the
    oracle's list_distance sums sequentially; argmin over these only
    diverges on exact float ties, which quantized centroids make
    measure-zero), argmin keeping the FIRST minimum."""
    import numpy as np

    return np.stack([((X - C[j]) ** 2).sum(axis=1) for j in range(len(C))], axis=1).argmin(
        axis=1
    )


def assign_cells(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: one Arrow-batched map-only pass.
    ``centroids`` is [(cell_id, vector), ...]; ties go to the smallest
    cell id."""
    import numpy as np
    import pandas as pd

    cell_ids, C = _centroid_arrays(centroids)

    def fn(batches):
        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "cell": cell_ids[_argmin_cells(X, C)]}
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
    dropped (not reseeded) — mirrored by the SQL oracle.

    Returns a self-consistent pair: the last round's assignment (under
    the second-to-last centroids) and the centroids that are the means
    OF that assignment (a3/c3 in the oracle CTE chain). The assignment
    comes from the SAME fused pass as the last mean update (emitted as
    marker rows, localCheckpoint'ed), so no extra corpus scan exists
    and downstream consumers never re-run the argmin.
    """
    if iters < 1:
        raise ValueError("lloyd_kmeans needs iters >= 1 (assignment comes from the last round)")
    init_rows = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init_rows)]
    assign = None
    for it in range(iters):
        last = it == iters - 1
        fused = _fused_estep_pass(
            emb, cents, id_col=id_col, vec_col=vec_col, with_assign=last
        )
        if last:
            # materialized once: both the mean aggregation below and the
            # returned assignment read this, not a re-run of the argmin
            fused = fused.localCheckpoint(eager=True)
            assign = fused.where(F.col("pos") < 0).select(
                F.col("id").alias(id_col), "cell"
            )
        means = (
            fused.where(F.col("pos") >= 0)
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
    return assign, cents


def _fused_estep_pass(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    *,
    id_col: str,
    vec_col: str,
    with_assign: bool,
) -> DataFrame:
    """One Arrow pass fusing the E-step and the M-step's partial
    aggregation: per batch, argmin-assign, then emit (cell, pos,
    sum-of-dim, count) partials for each non-empty cell — plus, when
    ``with_assign``, one marker row per input row (pos = -1, id set)
    carrying the assignment itself."""
    import numpy as np
    import pandas as pd

    cell_ids, C = _centroid_arrays(centroids)

    def fn(batches):
        for pdf in batches:
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X) == 0:
                continue
            d = X.shape[1]
            a = _argmin_cells(X, C)
            cells, poss, sums, cnts, ids = [], [], [], [], []
            for ci in np.unique(a):
                mask = a == ci
                cells.append(np.full(d, cell_ids[ci]))
                poss.append(np.arange(d, dtype=np.int32))
                sums.append(X[mask].sum(axis=0))
                cnts.append(np.full(d, int(mask.sum()), dtype=np.int64))
                if with_assign:
                    ids.append(np.zeros(d, dtype=np.int64))
            if with_assign:
                n = len(X)
                cells.append(cell_ids[a])
                poss.append(np.full(n, -1, dtype=np.int32))
                sums.append(np.zeros(n))
                cnts.append(np.zeros(n, dtype=np.int64))
                ids.append(pdf[id_col].to_numpy())
            out = {
                "cell": np.concatenate(cells),
                "pos": np.concatenate(poss),
                "s": np.concatenate(sums),
                "c": np.concatenate(cnts),
            }
            if with_assign:
                out = {"id": np.concatenate(ids), **out}
            yield pd.DataFrame(out)

    # the always-zero id column would otherwise ride through every
    # non-final round's partial rows for nothing
    if with_assign:
        return emb.select(id_col, vec_col).mapInPandas(
            fn, "id long, cell long, pos int, s double, c long"
        )
    return emb.select(vec_col).mapInPandas(fn, "cell long, pos int, s double, c long")
