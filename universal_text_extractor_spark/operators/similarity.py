"""Similarity search over the ``embeddings`` table (array<float>[64]).

- brute-force cosine top-k: the exact baseline. Query side broadcast; the
  dot product runs JVM-side via zip_with/aggregate (no Python).
- LSH-bucketed ANN: random-hyperplane signatures from a FIXED deterministic
  ±1 matrix (generated from md5 at import time and inlined as literals in
  both the Spark plan and the DuckDB oracle SQL) → bucket join → cosine
  verify within bucket. Sub-quadratic scale path.

All float math is promoted to double *before* multiply/accumulate in both
engines (same fold order), and similarities are rounded to 6 dp, so the
DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64
LSH_PLANES = 12


def _plane_matrix() -> list[list[int]]:
    """LSH_PLANES × EMB_DIM ±1 matrix, deterministic via md5(j:i)."""
    m = []
    for j in range(LSH_PLANES):
        row = []
        for i in range(EMB_DIM):
            h = hashlib.md5(f"{j}:{i}".encode()).hexdigest()
            row.append(1 if int(h[:2], 16) % 2 == 0 else -1)
        m.append(row)
    return m


PLANES = _plane_matrix()


def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_sim(a: Column, b: Column) -> Column:
    """Σ a·b / (√Σa² · √Σb²) with sequential double folds (oracle-parity)."""
    dot = F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nb = F.sqrt(
        F.aggregate(_dbl(b), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame, query_ids: tuple[int, ...] = (0, 1, 2, 3, 4), k: int = 10
) -> DataFrame:
    """Exact cosine top-k for each query vector (self excluded): broadcast
    the queries, rank per query with a window. Returns
    (query_id, vec_id, sim, rk)."""
    from pyspark.sql.window import Window

    q = embeddings.filter(F.col("vec_id").isin(*query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(cosine_sim(F.col("q_emb"), F.col("embedding")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        joined.select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def lsh_signature_col(emb: Column) -> Column:
    """Random-hyperplane signature: bit j = sign(Σ_i emb[i]·PLANES[j][i])."""
    e = _dbl(emb)
    sig = F.lit(0).cast("long")
    for j in range(LSH_PLANES):
        plane = F.array(*[F.lit(float(v)) for v in PLANES[j]])
        proj = F.aggregate(
            F.zip_with(e, plane, lambda x, p: x * p),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(2 ** j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def lsh_ann_pairs(embeddings: DataFrame, sim_threshold: float = 0.6) -> DataFrame:
    """ANN near-neighbor pairs: same-bucket candidates (hyperplane LSH),
    cosine-verified. Sub-quadratic: the cross join is per-bucket."""
    sigs = embeddings.select(
        "vec_id", "embedding", lsh_signature_col(F.col("embedding")).alias("sig")
    )
    a = sigs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("emb_a"),
        F.col("sig"),
    )
    b = sigs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("sig"),
    )
    cand = a.join(b, "sig").filter(F.col("vec_a") < F.col("vec_b"))
    sim = F.round(cosine_sim(F.col("emb_a"), F.col("emb_b")), 6)
    return (
        cand.select("vec_a", "vec_b", sim.alias("sim"))
        .filter(F.col("sim") >= sim_threshold)
    )


IVF_CENTROIDS_N = 8


def _centroid_matrix() -> list[list[int]]:
    """IVF_CENTROIDS_N × EMB_DIM ±1 centroid matrix, deterministic via
    md5('c{c}:{i}') — disjoint seed space from PLANES."""
    m = []
    for c in range(IVF_CENTROIDS_N):
        row = []
        for i in range(EMB_DIM):
            h = hashlib.md5(f"c{c}:{i}".encode()).hexdigest()
            row.append(1 if int(h[:2], 16) % 2 == 0 else -1)
        m.append(row)
    return m


CENTROIDS = _centroid_matrix()


def centroid_scores_col(emb: Column) -> Column:
    """array<double>[IVF_CENTROIDS_N]: dot(centroid_c, emb) per centroid
    (±1 centroids share a norm, so the max dot IS the max cosine)."""
    e = _dbl(emb)
    scores = []
    for c in range(IVF_CENTROIDS_N):
        cen = F.array(*[F.lit(float(v)) for v in CENTROIDS[c]])
        scores.append(
            F.aggregate(
                F.zip_with(e, cen, lambda x, p: x * p),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*scores)


def ivf_topk(
    embeddings: DataFrame,
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF approximate top-k (the scale path next to
    :func:`brute_force_topk`): assign every vector to its nearest ±1
    centroid (an inverted list), probe only the query's ``n_probe`` best
    lists, rank candidates by exact cosine. At 10^12 vectors the
    per-query candidate set shrinks by ~n_probe/IVF_CENTROIDS_N and the
    assignment is a one-pass map; the probe join is a broadcast of the
    (tiny) query set. Returns (query_id, vec_id, sim, rk).

    Ties: cluster assignment takes the FIRST max (array_position), probe
    ranking orders by (score desc, cluster asc) — both mirrored exactly in
    the DuckDB oracle.
    """
    from pyspark.sql.window import Window

    assigned = embeddings.select(
        "vec_id",
        "embedding",
        centroid_scores_col(F.col("embedding")).alias("cscores"),
    ).select(
        "vec_id",
        "embedding",
        F.array_position(F.col("cscores"), F.array_max(F.col("cscores")))
        .cast("int")
        .alias("cluster"),
    )

    q = (
        embeddings.filter(F.col("vec_id").isin(*query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.posexplode(centroid_scores_col(F.col("embedding"))).alias(
                "cidx", "cscore"
            ),
        )
        .withColumn(
            "prank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cscore"), F.asc("cidx")
                )
            ),
        )
        .filter(F.col("prank") <= n_probe)
        .select("query_id", "q_emb", (F.col("cidx") + 1).alias("cluster"))
    )

    cand = assigned.join(F.broadcast(q), "cluster").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = F.round(cosine_sim(F.col("q_emb"), F.col("embedding")), 6)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cand.select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def embedding_near_dup(embeddings: DataFrame, sim_threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate count via LSH buckets (the dedup
    variant: very high threshold)."""
    pairs = lsh_ann_pairs(embeddings, sim_threshold)
    return pairs.agg(
        F.count("*").alias("near_dup_pairs"),
        F.round(F.coalesce(F.avg("sim"), F.lit(0.0)), 6).alias("avg_sim"),
    )
