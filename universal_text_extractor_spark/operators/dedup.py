"""Deduplication operators for training-data pipelines (task brief:
exact, MinHash+LSH, SimHash, n-gram Jaccard — each over ``documents``).

Cross-engine determinism contract: every hash is derived from md5 (identical
in Spark and DuckDB), so the DuckDB oracle in __spark_entry__.py recomputes
signatures exactly — full value-hash checks, not rows-only.

Scale notes:
- exact dedup: one hash-aggregate on the normalized-text key (map-side
  partial); at 100 TB use xxhash64(text) as the group key so the shuffle
  carries 8-byte keys, not documents (here md5-15-hex for oracle parity —
  same shape).
- n-gram Jaccard: explode-shingle + self-join is quadratic in the worst
  case; the shingle join key bounds candidates to pairs sharing ≥1 shingle
  (inverted-index join). At scale, MinHash-LSH below replaces it.
- MinHash LSH: bands of the signature become join keys — candidate set is
  per-bucket, the classic sub-quadratic path; verify step recomputes true
  Jaccard only for candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text_funcs import normalized_text_col, shingles_col

NUM_MINHASHES = 16
LSH_BANDS = 4  # 4 bands × 4 rows
SHINGLE_K = 3

# XOR-permutation constants for the MinHash family: h_j = md5_long(s) XOR
# XOR_SEEDS[j]. One md5 per shingle instead of NUM_MINHASHES md5s (16×
# cheaper at 100 TB); XOR-by-constant is a weaker permutation family than
# independent hashes, which only lowers LSH candidate recall slightly — and
# every candidate is verified with true Jaccard afterwards. Constants are
# 60-bit, derived deterministically from md5(j) at import (mirrored
# literally in the oracle SQL).
import hashlib as _hashlib

XOR_SEEDS = [
    int(_hashlib.md5(f"seed:{j}".encode()).hexdigest()[:15], 16)
    for j in range(NUM_MINHASHES)
]


def md5_long(col: Column, prefix: str = "") -> Column:
    """First 15 hex chars of md5 as a BIGINT — bit-identical to DuckDB's
    ``('0x'||substr(md5(x),1,15))::BIGINT``."""
    src = F.concat(F.lit(prefix), col) if prefix else col
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("long")


def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Exact duplicate groups on normalized text: group key, group size,
    canonical (min) doc_id. Groups of size 1 included → deterministic full
    inventory (the dedup *report*; filter size>1 for the purge set)."""
    key = md5_long(normalized_text_col(F.col("text")))
    return (
        documents.select(F.col("doc_id"), key.alias("text_key"))
        .groupBy("text_key")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("group_size") > 1)
    )


def exact_dedup_keep(documents: DataFrame) -> DataFrame:
    """The kept set: min doc_id per normalized-text key — aggregate count
    only (SQL-checkable summary)."""
    key = md5_long(normalized_text_col(F.col("text")))
    kept = (
        documents.select("doc_id", key.alias("text_key"))
        .groupBy("text_key")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return kept.agg(F.count("*").alias("kept_count"))


def _shingled(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", shingles_col(F.col("text"), SHINGLE_K).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))


def ngram_jaccard_pairs(documents: DataFrame, threshold: float = 0.8) -> DataFrame:
    """n-gram Jaccard near-dup pairs via inverted-index self-join:
    explode shingles → join on shingle → |∩| per (a,b) → Jaccard.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b."""
    sh = _shingled(documents)
    ex = sh.select("doc_id", "n_shingles", F.explode("shingles").alias("shingle"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(documents: DataFrame) -> DataFrame:
    """(doc_id, sig array<long>[NUM_MINHASHES]) — md5-seeded MinHash,
    reproducible in the DuckDB oracle."""
    sh = _shingled(documents).filter(F.col("n_shingles") > 0)
    hashed = sh.withColumn(
        "shash", F.transform(F.col("shingles"), lambda s: md5_long(s))
    )

    # NB: factory, not a default-arg lambda — pyspark derives the number of
    # higher-order lambda variables from the function arity, so a `j=j`
    # default would silently receive the element *index* column.
    def _perm(j: int):
        seed = XOR_SEEDS[j]
        return lambda h: h.bitwiseXOR(F.lit(seed))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shash"), _perm(j)))
            for j in range(NUM_MINHASHES)
        ]
    )
    return hashed.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(documents: DataFrame, threshold: float = 0.5) -> DataFrame:
    """MinHash+LSH near-dup candidates: band the signature (LSH_BANDS bands
    × NUM_MINHASHES/LSH_BANDS rows), bucket-join per band, dedupe candidate
    pairs, verify with true Jaccard. Returns (doc_a, doc_b, jaccard)."""
    rows_per_band = NUM_MINHASHES // LSH_BANDS
    sigs = minhash_signatures(documents)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[bi * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for bi in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = _shingled(documents)
    sa = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("na"),
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("nb"),
    )
    joined = cand.join(sa, "doc_a").join(sb, "doc_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (
        joined.select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_col(text: Column, bits: int = 16) -> Column:
    """SimHash over whitespace tokens: bit b of the fingerprint is the sign
    of Σ_tokens (±1 by bit b of md5_long(token)). ``bits`` kept small so
    the oracle SQL (which expands per bit) stays tractable; the Spark shape
    is identical at 64 bits."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    hashes = F.transform(toks, lambda t: md5_long(t))

    def _bit_merge(bb: int):  # factory — see _seeded note in minhash_signatures
        return lambda acc, h: acc + (
            F.shiftright(h, bb).bitwiseAND(F.lit(1)) * 2 - 1
        )

    bit_cols = []
    for bb in range(bits):
        contrib = F.aggregate(hashes, F.lit(0).cast("long"), _bit_merge(bb))
        bit_cols.append(
            F.when(contrib > 0, F.lit(2 ** bb).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def simhash_dedup_groups(documents: DataFrame, bits: int = 16) -> DataFrame:
    """Documents sharing a SimHash fingerprint (hamming-0 buckets; at scale
    extend with bit-rotation tables for hamming ≤ k)."""
    fp = documents.select(
        "doc_id", simhash_col(F.col("text"), bits).alias("simhash")
    )
    return (
        fp.groupBy("simhash")
        .agg(F.count("*").alias("group_size"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("group_size") > 1)
        .orderBy("simhash")
    )
