"""Distributed k-means (iterative driver-loop algorithm): determinism,
monotone convergence, and full coverage of the assignment."""

from __future__ import annotations

import os

from universal_text_extractor_spark.operators.clustering import (
    kmeans_cluster_profile,
    kmeans_fit,
)

SF_DIR = os.environ.get("UTES_TEST_SF_DIR", "/root/testdata/sf0.001")


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_kmeans_covers_all_vectors_and_is_deterministic(spark):
    emb = _emb(spark)
    n = emb.count()
    prof1 = [tuple(r) for r in kmeans_cluster_profile(emb).collect()]
    prof2 = [tuple(r) for r in kmeans_cluster_profile(emb).collect()]
    assert prof1 == prof2  # same input → same clustering
    assert sum(r[1] for r in prof1) == n  # every vector assigned once
    assert all(r[2] >= 0 for r in prof1)


def test_kmeans_inertia_non_increasing(spark):
    """Lloyd's guarantee: total squared distance never increases with more
    iterations (assignment and update steps each minimize it)."""
    emb = _emb(spark)
    inertia = []
    for iters in (0, 1, 3):
        _, assigned = kmeans_fit(emb, n_iter=iters)
        inertia.append(
            assigned.groupBy().sum("dist").collect()[0][0]
        )
    assert inertia[0] >= inertia[1] >= inertia[2]
    assert inertia[2] < inertia[0]  # it actually moved


def test_kmeans_no_python_in_assignment_plan(spark):
    """The assign pass must be map-only JVM work: no Python eval, no
    exchange before the aggregate."""
    from universal_text_extractor_spark.operators.clustering import _assign, _dbl
    from pyspark.sql import functions as F

    emb = _emb(spark)
    init = [list(r["e"]) for r in emb.orderBy("vec_id").limit(4)
            .select(_dbl(F.col("embedding")).alias("e")).collect()]
    plan = _assign(emb, init)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    assert "Exchange" not in plan, plan  # assignment is shuffle-free
