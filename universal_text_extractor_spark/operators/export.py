"""A12 full per-user export envelope (reference utils/database.py:623-724
``export_user_data``): the two per-user tables (extraction_logs, user
feedback) serialized into a nested json / sectioned csv / txt document
with the reference's exact field names and section framing.

Two shapes:

- :func:`user_envelopes` — the Spark-first form: ONE distributed pass
  builds the envelope rows for EVERY user (filter → sort_array of
  collect_list(struct) → full-outer join of the two aggregates). At 10^12
  log rows this is two hash aggregates + one join, no driver loop; the
  result writes through the existing json sink.
- :func:`export_user_data` — the reference-parity form: one user, returns
  the formatted string ('json' | 'csv' | 'txt') with byte-faithful section
  framing. The heavy lifting (filter + sort) is DataFrame work; only the
  final ≤1-row envelope is assembled driver-side.

Determinism fix over the reference: rows are ordered (timestamp DESC,
id ASC) — the reference's bare ``ORDER BY timestamp DESC`` leaves ties to
sqlite's whim (same class of contract fix as SURVEY.md §3.2).

Expected columns (reference schema, utils/database.py:47-69):
- logs:     id, user_id, file_name, file_type, file_size_bytes,
            processing_time, success, ocr_used, timestamp
- feedback: id, username, feedback_type, feedback_text, rating, timestamp
"""

from __future__ import annotations

import csv
import io
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOG_COLS = (
    "id", "user_id", "file_name", "file_type", "file_size_bytes",
    "processing_time", "success", "ocr_used", "timestamp",
)
FEEDBACK_COLS = ("id", "username", "feedback_type", "feedback_text", "rating", "timestamp")


def _nested(df: DataFrame, user_col: str, cols: tuple[str, ...], out: str) -> DataFrame:
    """(username, <out>: array<struct>) — per-user rows as a sorted nested
    array. Sort key (-timestamp handling via sort on struct): collect_list
    order is nondeterministic under parallelism, so the array is sorted
    AFTER collection by (timestamp DESC, id ASC) encoded as a sortable
    struct prefix."""
    struct_cols = [F.col(c) for c in cols]
    packed = F.struct(
        F.col("timestamp").alias("_ts"), F.col("id").alias("_id"),
        *struct_cols,
    )
    agg = (
        df.groupBy(F.col(user_col).alias("username"))
        .agg(F.collect_list(packed).alias("_raw"))
        # sort_array ascending on (_ts, _id) then reverse ≈ (ts DESC, id DESC)
        # — not the contract; instead sort descending and re-sort ties:
        # array_sort with a comparator lambda gives (ts DESC, id ASC).
        # NULL timestamps sort LAST, mirroring the single-user path's
        # orderBy(desc) default (DESC NULLS LAST) — the bare >/< whens
        # evaluate NULL (= false) against a null _ts and would otherwise
        # interleave null-ts rows by id (r5 review finding)
        .select(
            "username",
            F.array_sort(
                "_raw",
                lambda a, b: F.when(
                    a["_ts"].isNull() & b["_ts"].isNotNull(), F.lit(1)
                )
                .when(a["_ts"].isNotNull() & b["_ts"].isNull(), F.lit(-1))
                .when(a["_ts"] > b["_ts"], -1)
                .when(a["_ts"] < b["_ts"], 1)
                .when(a["_id"] < b["_id"], -1)
                .when(a["_id"] > b["_id"], 1)
                .otherwise(0),
            ).alias("_sorted"),
        )
        .select(
            "username",
            F.transform(
                "_sorted", lambda s: F.struct(*[s[c].alias(c) for c in cols])
            ).alias(out),
        )
    )
    return agg


def user_envelopes(logs: DataFrame, feedback: DataFrame) -> DataFrame:
    """Envelope rows for every user in one distributed pass:
    (username, extraction_logs array<struct>, feedback array<struct>).
    Users present in either table appear; the missing side is an empty
    array (the reference emits the key with an empty list)."""
    lg = _nested(logs, "user_id", LOG_COLS, "extraction_logs")
    fb = _nested(feedback, "username", FEEDBACK_COLS, "feedback")
    joined = lg.join(fb, "username", "full_outer")
    empty_log = F.array().cast(joined.schema["extraction_logs"].dataType)
    empty_fb = F.array().cast(joined.schema["feedback"].dataType)
    return joined.select(
        "username",
        F.coalesce("extraction_logs", empty_log).alias("extraction_logs"),
        F.coalesce("feedback", empty_fb).alias("feedback"),
    )


def _rows_for(df: DataFrame, user_col: str, username: str, cols: tuple[str, ...]):
    collected = (
        df.filter(F.col(user_col) == username)
        .orderBy(F.desc("timestamp"), F.asc("id"))
        .select(*cols)
        .collect()
    )
    return [{c: r[c] for c in cols} for r in collected]


def export_user_data(
    logs: DataFrame,
    feedback: DataFrame,
    username: str,
    format_type: str = "json",
    data_types: list[str] | None = None,
    export_date: str = "1970-01-01 00:00:00",
) -> str:
    """Reference-parity single-user export (utils/database.py:623-724):
    same envelope keys, same section headers, same formats. ``export_date``
    is a parameter (the reference stamps wall-clock ``now()`` — injected
    here so output is reproducible; callers wanting reference behavior pass
    their own timestamp)."""
    if data_types is None:
        data_types = ["all"]
    result: dict = {"username": username, "export_date": export_date}
    if "all" in data_types or "extraction_logs" in data_types:
        result["extraction_logs"] = _rows_for(logs, "user_id", username, LOG_COLS)
    if "all" in data_types or "feedback" in data_types:
        result["feedback"] = _rows_for(feedback, "username", username, FEEDBACK_COLS)

    if format_type == "json":
        return json.dumps(result, indent=2, default=str)
    if format_type == "csv":
        output = io.StringIO()
        if result.get("extraction_logs"):
            output.write("EXTRACTION LOGS\n")
            writer = csv.DictWriter(output, fieldnames=list(LOG_COLS))
            writer.writeheader()
            writer.writerows(result["extraction_logs"])
            output.write("\n")
        if result.get("feedback"):
            output.write("USER FEEDBACK\n")
            writer = csv.DictWriter(output, fieldnames=list(FEEDBACK_COLS))
            writer.writeheader()
            writer.writerows(result["feedback"])
        return output.getvalue()
    if format_type == "txt":
        out = [f"Data Export for User: {username}", f"Date: {result['export_date']}", ""]
        if result.get("extraction_logs"):
            out.append("=== EXTRACTION LOGS ===")
            for log in result["extraction_logs"]:
                out.append("-" * 40)
                out.extend(f"{k}: {v}" for k, v in log.items())
            out.append("")
        if result.get("feedback"):
            out.append("=== USER FEEDBACK ===")
            for fb in result["feedback"]:
                out.append("-" * 40)
                out.extend(f"{k}: {v}" for k, v in fb.items())
        return "\n".join(out)
    return "Unsupported export format"


def logs_from_extracted(extracted: DataFrame, user_id: str = "pipeline") -> DataFrame:
    """Adapter: the extraction pipeline's output rows AS extraction_logs
    (the reference logs one row per extracted file; here url plays
    file_name, input_bytes plays file_size_bytes, extract_us → seconds).
    ``id`` is xxhash64(url) — deterministic and computed map-side (the
    reference's autoincrement would be a global sort here; the id only
    serves as the envelope sort tiebreak)."""
    return extracted.select(
        F.xxhash64("url").alias("id"),
        F.lit(user_id).alias("user_id"),
        F.col("url").alias("file_name"),
        F.col("content_type").alias("file_type"),
        F.col("input_bytes").alias("file_size_bytes"),
        (F.col("extract_us") / 1e6).alias("processing_time"),
        F.col("success").cast("int").alias("success"),
        F.col("ocr_used").cast("int").alias("ocr_used"),
        F.col("extracted_at").cast("string").alias("timestamp"),
    )
