"""Distributed Lloyd's k-means over the ``embeddings`` table — the task
brief's "iterative algorithms" category (genuinely non-SQL-expressible →
the driver records the rows-only check; semantics locked by
tests/test_clustering.py). Beyond the reference (which has no vector ops);
the training-data use is cluster-based curation: prune/sample a corpus by
embedding cluster.

Scale shape per iteration:
- ASSIGN: the k×EMB_DIM centroids are inlined as literal arrays into a
  codegen'd argmin-of-squared-distance expression — a map-only pass, NO
  shuffle and no Python (the same literal-matrix trick as the IVF/LSH
  operators).
- UPDATE: per-cluster per-dimension means via ONE hash aggregate
  (map-side partial combine); only k rows reach the driver.
Driver state between iterations is the k×EMB_DIM centroid matrix —
constant size regardless of corpus scale. Iterations are a driver loop,
as Spark iterative algorithms are (each iteration is one job).

Determinism: init = the vectors of the k smallest vec_ids; argmin ties
break to the lowest cluster index; empty clusters keep their previous
centroid. Same input → same clustering at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import EMB_DIM, _dbl

DEFAULT_K = 8
DEFAULT_ITERS = 3


def _sq_dist(e_dbl: Column, centroid: list[float]) -> Column:
    """Σ (x_i − c_i)² as a sequential fold against a literal centroid."""
    cen = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(e_dbl, cen, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(embeddings: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, e, cluster, dist): nearest centroid per vector, ties to the
    lowest index — map-only, codegen'd."""
    e = _dbl(F.col("embedding"))
    base = embeddings.select("vec_id", e.alias("e"))
    dists = [
        _sq_dist(F.col("e"), centroids[i]).alias(f"d{i}")
        for i in range(len(centroids))
    ]
    scored = base.select("vec_id", "e", *dists)
    best = F.least(*[F.col(f"d{i}") for i in range(len(centroids))])
    cluster = F.lit(len(centroids) - 1)
    for i in range(len(centroids) - 2, -1, -1):  # reverse → lowest index wins ties
        cluster = F.when(F.col(f"d{i}") == best, F.lit(i)).otherwise(cluster)
    return scored.select(
        "vec_id", "e", cluster.alias("cluster"), best.alias("dist")
    )


def kmeans_fit(
    embeddings: DataFrame, k: int = DEFAULT_K, n_iter: int = DEFAULT_ITERS
) -> tuple[list[list[float]], DataFrame]:
    """Run ``n_iter`` Lloyd iterations; returns (centroids, assignment df
    with (vec_id, cluster, dist))."""
    init_rows = (
        embeddings.orderBy("vec_id")
        .limit(k)
        .select(_dbl(F.col("embedding")).alias("e"))
        .collect()
    )
    centroids = [list(r["e"]) for r in init_rows]
    assigned = _assign(embeddings, centroids)
    for _ in range(n_iter):
        means = (
            assigned.groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.avg(F.element_at("e", i + 1)).alias(f"c{i}")
                    for i in range(EMB_DIM)
                ],
            )
            .collect()
        )
        new_cents = [list(c) for c in centroids]  # empty clusters keep theirs
        for r in means:
            new_cents[r["cluster"]] = [r[f"c{i}"] for i in range(EMB_DIM)]
        centroids = new_cents
        assigned = _assign(embeddings, centroids)
    return centroids, assigned.select("vec_id", "cluster", "dist")


def kmeans_cluster_profile(
    embeddings: DataFrame, k: int = DEFAULT_K, n_iter: int = DEFAULT_ITERS
) -> DataFrame:
    """Per-cluster sizes + mean squared distance after ``n_iter``
    iterations — the query-surface summary of the fit (rows-only check:
    iterative, not SQL-expressible)."""
    _, assigned = kmeans_fit(embeddings, k, n_iter)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("dist"), 6).alias("mean_sq_dist"),
        )
        .orderBy("cluster")
    )
