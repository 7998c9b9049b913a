"""Streaming extraction: availableNow micro-batch over a parquet file
source, exactly-once resume via checkpoint, byte-identity vs batch."""

from __future__ import annotations

from universal_text_extractor_spark.operators.extract import extract_pages
from universal_text_extractor_spark.sources.pages_gen import generate_pages_df
from universal_text_extractor_spark.streaming import (
    stream_extract_pages,
    windowed_metrics,
)

N = 200


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = generate_pages_df(spark, N, partitions=4)
    pages.write.parquet(src)

    q = stream_extract_pages(spark, src, out, ckpt, num_partitions=4)
    q.awaitTermination(300)

    got = {r["url"]: r["text"] for r in spark.read.parquet(out).collect()}
    want = {
        r["url"]: r["text"]
        for r in extract_pages(spark.read.parquet(src), num_partitions=4).collect()
    }
    assert got == want

    # arrival of new files → only the delta is processed on restart
    generate_pages_df(spark, 50, partitions=2, ).write.mode("append").parquet(src)
    q2 = stream_extract_pages(spark, src, out, ckpt, num_partitions=4)
    q2.awaitTermination(300)
    total = spark.read.parquet(out).count()
    assert total == N + 50  # no reprocessing of the first N (exactly-once)


def test_windowed_metrics_batch_semantics(spark):
    # windowed agg is testable on a static frame (same expression tree)
    pages = generate_pages_df(spark, 300, partitions=2)
    m = windowed_metrics(pages).collect()
    assert sum(r["doc_count"] for r in m) == 300
    assert all(r["window_end"] > r["window_start"] for r in m)
