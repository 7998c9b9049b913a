#!/usr/bin/env python
"""Phase-level scaling diagnosis for the extraction pipeline.

Runs one extraction at a given core count, timing each phase separately:
  A. parquet scan + content_type + salted repartition + persist (count)
  B. branch fan-out UDFs + union + aggregate (reading persisted base)
Prints one JSON line. Used to find which phase breaks 4->16 scaling.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def main(cores: int, rows: int) -> None:
    from pyspark.sql import functions as F

    from universal_text_extractor_spark.functions.sniff import content_type_col
    from universal_text_extractor_spark.operators import extract as X

    spark = bench._session(cores, shuffle_partitions=bench.EXTRACT_PARTITIONS)
    pages = spark.read.parquet(bench.DATA_DIR)
    # warmup python workers + JIT
    X.extract_pages(pages.limit(300), num_partitions=cores).agg(
        F.sum(F.length("text"))
    ).collect()

    from pyspark.storagelevel import StorageLevel

    t0 = time.time()
    typed = pages.withColumn(
        "content_type", content_type_col(F.col("url"), F.col("html"))
    )
    base = typed.repartition(
        bench.EXTRACT_PARTITIONS, X.salted_url_partition_key(F.col("url"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = base.count()
    t_persist = time.time() - t0

    # fan-out over the already-persisted base (no second shuffle): replicate
    # extract_pages' branch loop
    from functools import reduce

    from pyspark.sql import DataFrame

    from universal_text_extractor_spark.kernels.dispatch import BRANCH_FAMILIES

    t0 = time.time()
    b2 = base.withColumn("partition_id", F.spark_partition_id()).withColumn(
        "input_bytes", F.coalesce(F.length("html"), F.lit(0)).cast("long")
    )
    all_typed = [t for types in BRANCH_FAMILIES.values() for t in types]
    branches = []
    # one shared dispatch UDF (the former per-family `family` arg is gone;
    # passing it positionally would bind to use_ocr and silently profile
    # the OCR path — r5 review, batch 5)
    udf = X._branch_udf()
    for family, types in BRANCH_FAMILIES.items():
        pred = (
            F.col("content_type") == types[0]
            if len(types) == 1
            else F.col("content_type").isin(*types)
        )
        branches.append(
            b2.filter(pred)
            .withColumn("res", udf(F.col("url"), F.col("html"), F.col("content_type")))
            .select("url", "res.text")
        )
    branches.append(
        b2.filter(~F.col("content_type").isin(*all_typed)).select(
            "url", F.lit("[unsupported]").alias("text")
        )
    )
    ext = reduce(DataFrame.unionByName, branches)
    out = ext.agg(
        F.count("*").alias("docs"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]
    t_fanout = time.time() - t0
    spark.stop()
    print(json.dumps({
        "cores": cores, "rows": n, "docs": out["docs"],
        "persist_sec": round(t_persist, 2), "fanout_sec": round(t_fanout, 2),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 150000)
