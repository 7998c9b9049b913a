#!/usr/bin/env python
"""A/B scaling experiments for the extraction bench path.

Usage: bench_variants.py <cores> <variant>
Variants:
  persist          — current bench path (persist MEMORY_AND_DISK)
  nopersist        — ReusedExchange: branches re-read shuffle output
  disk             — persist DISK_ONLY (serialized, low GC)
  onepass          — fused single-pass mapInPandas dispatch
  onepass-norepart — fused without the salted repartition
  noop             — onepass plan shape, kernel skipped (data-movement floor)
Prints one JSON line with wall seconds for the timed region.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def _session(cores: int):
    """bench._session + experimental I/O configs toggled by env vars."""
    import os

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"utes-variant-{cores}")
        .config("spark.sql.shuffle.partitions", str(bench.EXTRACT_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", os.environ.get("V_BATCH", "256"))
        .config("spark.driver.memory", os.environ.get("V_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    )
    if os.environ.get("V_ZSTD"):
        b = b.config("spark.io.compression.codec", "zstd")
    if os.environ.get("V_SHM"):
        b = b.config("spark.local.dir", "/dev/shm/spark-local")
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s


def _onepass(pages, repartition: bool):
    """Single mapInPandas pass: dispatch inside the UDF (no filter+union)."""
    from pyspark.sql import functions as F

    from universal_text_extractor_spark.functions.sniff import content_type_col
    from universal_text_extractor_spark.kernels.dispatch import extract_payload
    from universal_text_extractor_spark.operators.extract import (
        salted_url_partition_key,
    )

    typed = pages.withColumn(
        "content_type", content_type_col(F.col("url"), F.col("html"))
    ).select("url", "html", "content_type")
    if repartition:
        typed = typed.repartition(
            bench.EXTRACT_PARTITIONS, salted_url_partition_key(F.col("url"))
        )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            texts = [
                extract_payload(u, h, ct)[0]
                for u, h, ct in zip(pdf["url"], pdf["html"], pdf["content_type"])
            ]
            yield pd.DataFrame({"url": pdf["url"], "text": texts})

    return typed.mapInPandas(run, "url string, text string")


def main(cores: int, variant: str) -> None:
    from pyspark.sql import functions as F

    from universal_text_extractor_spark.operators.extract import extract_pages

    spark = _session(cores)
    pages = spark.read.parquet(bench.DATA_DIR)
    extract_pages(pages.limit(300), num_partitions=cores).agg(
        F.sum(F.length("text"))
    ).collect()

    t0 = time.time()
    if variant == "persist":
        ext = extract_pages(pages, num_partitions=bench.EXTRACT_PARTITIONS,
                            persist_base=True)
    elif variant == "nopersist":
        ext = extract_pages(pages, num_partitions=bench.EXTRACT_PARTITIONS,
                            persist_base=False)
    elif variant == "disk":
        ext = extract_pages(pages, num_partitions=bench.EXTRACT_PARTITIONS,
                            persist_base="disk")
    elif variant == "onepass":
        ext = _onepass(pages, repartition=True)
    elif variant == "onepass-norepart":
        ext = _onepass(pages, repartition=False)
    elif variant == "noop":
        # data-movement-only: same plan shape as onepass, kernel skipped —
        # isolates the scan+shuffle+Arrow+pandas pipeline cost
        from universal_text_extractor_spark.functions.sniff import content_type_col
        from universal_text_extractor_spark.operators.extract import (
            salted_url_partition_key,
        )

        typed = pages.withColumn(
            "content_type", content_type_col(F.col("url"), F.col("html"))
        ).select("url", "html", "content_type")
        typed = typed.repartition(
            bench.EXTRACT_PARTITIONS, salted_url_partition_key(F.col("url"))
        )

        def run_noop(batches):
            import pandas as pd

            for pdf in batches:
                n = [len(h) if h is not None else 0 for h in pdf["html"]]
                yield pd.DataFrame({"url": pdf["url"],
                                    "text": [str(x) for x in n]})

        ext = typed.mapInPandas(run_noop, "url string, text string")
    else:
        raise SystemExit(f"unknown variant {variant}")
    out = ext.agg(
        F.count("*").alias("docs"),
        F.sum(F.length("text")).alias("chars"),
    ).collect()[0]
    wall = time.time() - t0
    spark.stop()
    print(json.dumps({"cores": cores, "variant": variant,
                      "wall_sec": round(wall, 2), "docs": out["docs"],
                      "docs_per_sec": round(out["docs"] / wall, 1)}))


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
