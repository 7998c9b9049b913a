"""Analytics query surface (A1-A12, SURVEY.md §2.4) — DataFrame builders
mirroring the reference's ``get_analytics_summary`` SQLite queries
(reference utils/database.py:252-432) over the synthetic ``events`` table
(FIXTURES.md §3 mapping: event_type≈success flag, value≈file_size, ts≈
timestamp, user_id≈user_id).

Every computed column is aliased; the DuckDB oracle SQL in
__spark_entry__.py uses identical aliases (driver hash contract).

Determinism: every top-k adds a total-order tiebreak so the LIMIT row-set
is unique (the driver's value-hash is order-insensitive but the *set* must
be stable).

Scale notes: all are single-pass partial-agg shapes (TungstenAggregate with
map-side combine); top-k compiles to TakeOrderedAndProject (no global sort
materialization); the conditional counts are one scan, not N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference bucket edges utils/database.py:322-325 are 1/5/10 MiB over
# file_size_bytes; events.value spans ~0-100 so we mirror shape at 1/5/10.
BUCKET_EDGES = (1.0, 5.0, 10.0)
RETENTION_CUTOFF = "2024-01-20 00:00:00"  # fixed literal → deterministic D6


def total_count(events: DataFrame) -> DataFrame:
    """A1 (reference utils/database.py:266-273)."""
    return events.agg(F.count("*").alias("total_processed"))


def conditional_counts(events: DataFrame) -> DataFrame:
    """A2+A3 in one scan (reference :276-293): conditional counts via
    sum(case when …) — single aggregate, no double scan."""
    return events.agg(
        F.count("*").alias("total_processed"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchase_count"
        ),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "error_count"
        ),
    )


def avg_value(events: DataFrame) -> DataFrame:
    """A4 (reference :296-303): AVG with NULL→0 coalesce, rounded 2."""
    return events.agg(
        F.round(F.coalesce(F.avg("value"), F.lit(0.0)), 2).alias("avg_value")
    )


def top_event_types(events: DataFrame, k: int = 5) -> DataFrame:
    """A5 (reference :306-315): top-k group-by with deterministic tiebreak."""
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("event_type"))
        .limit(k)
    )


def value_histogram(events: DataFrame) -> DataFrame:
    """A6 (reference :317-348): 4-bucket conditional-sum histogram in one
    pass (the reference's CASE WHEN ladder)."""
    lo, mid, hi = BUCKET_EDGES
    v = F.col("value")
    return events.agg(
        F.sum(F.when(v < lo, 1).otherwise(0)).alias("small"),
        F.sum(F.when((v >= lo) & (v < mid), 1).otherwise(0)).alias("medium"),
        F.sum(F.when((v >= mid) & (v < hi), 1).otherwise(0)).alias("large"),
        F.sum(F.when(v >= hi, 1).otherwise(0)).alias("very_large"),
    )


def daily_trend(events: DataFrame, days: int = 7) -> DataFrame:
    """A7 (reference :350-379): last-N-days trend — group by date, take the
    N most recent days, re-sorted ascending (the reference's Python
    ``reversed``, :378-379)."""
    return (
        events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("day"))
        .limit(days)
        .orderBy(F.asc("day"))
    )


def top_users(events: DataFrame, k: int = 5) -> DataFrame:
    """A8 (reference :381-396) with deterministic tiebreak."""
    return (
        events.groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("user_id"))
        .limit(k)
    )


def derived_rates(events: DataFrame) -> DataFrame:
    """A9 (reference :400-409): 100·x/total with div-by-zero guard,
    round(.,1) — exact reference arithmetic shape."""
    agg = conditional_counts(events)
    total = F.col("total_processed")
    return agg.select(
        total,
        F.round(
            F.when(total > 0, F.col("purchase_count") * 100.0 / total).otherwise(0.0), 1
        ).alias("purchase_rate"),
        F.round(
            F.when(total > 0, F.col("error_count") * 100.0 / total).otherwise(0.0), 1
        ).alias("error_rate"),
    )


def ordered_scan(events: DataFrame, limit: int = 100) -> DataFrame:
    """A11 (reference :455, :523-529): ORDER BY ts DESC scan — tiebreak on
    event_id so the LIMIT set is deterministic. TakeOrderedAndProject."""
    return events.orderBy(F.desc("ts"), F.asc("event_id")).limit(limit)


PERCENTILES = (0.25, 0.5, 0.75, 0.95)


def value_percentiles(events: DataFrame) -> DataFrame:
    """Exact per-group percentiles of value (linear interpolation — Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the formula, so the
    oracle is a full hash check). Exact percentiles sort within each group;
    at 100 TB swap in ``percentile_approx`` (t-digest, mergeable map-side)
    and drop the oracle to rows-only — the query shape is identical."""
    return (
        events.groupBy("event_type")
        .agg(
            *[
                F.round(F.percentile("value", p), 6).alias(f"p{int(p * 100)}")
                for p in PERCENTILES
            ]
        )
        .orderBy("event_type")
    )


def point_lookup(events: DataFrame, event_id: int = 42) -> DataFrame:
    """D4 (reference utils/database.py get-by-key): single-row equi-filter
    on the key column. At scale this is the predicate-pushdown showcase on
    the key — the filter reaches the parquet scan and row groups whose
    statistics exclude the key are skipped entirely."""
    return events.filter(F.col("event_id") == event_id).select(
        "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
    )


def user_history(events: DataFrame, user_id: int = 7, limit: int = 20) -> DataFrame:
    """D5 (reference per-user log fetch, utils/database.py:445-470):
    one user's most recent events, newest first. TakeOrderedAndProject on
    a pushed-down user filter; total-order tiebreak on event_id so the
    LIMIT set is deterministic."""
    return (
        events.filter(F.col("user_id") == user_id)
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .select("event_id", "ts", "event_type", F.round("value", 2).alias("value"))
        .limit(limit)
    )


def retention_filter(events: DataFrame, cutoff: str = RETENTION_CUTOFF) -> DataFrame:
    """D6 (reference :539-581): rows older than the cutoff — the read side
    of retention cleanup (the DELETE itself is exercised on the pipeline's
    own output table, plans/pipeline.py). Proper timestamp compare, not the
    reference's lexical-string compare."""
    return events.filter(F.col("ts") < F.lit(cutoff).cast("timestamp")).agg(
        F.count("*").alias("expired_count"),
        F.min("ts").alias("oldest_ts"),
    )


def per_user_activity(events: DataFrame) -> DataFrame:
    """A12-shape (reference :623-724): per-user grouped envelope —
    groupBy + collect_list(struct) replaces the reference's in-Python
    grouping (app.py:881-887); here reduced to SQL-checkable per-user
    aggregates."""
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            # integer-cents sum — fold-order-proof across engines (w2 trick)
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias(
                "total_value"
            ),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        )
    )


def user_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session-window aggregation (``F.session_window``): events of a user
    closer than ``gap_minutes`` apart merge into one session; each session
    row carries its start, its end (last event + gap — Spark's session
    semantics), the event count, and the value sum. Not in the reference
    (its analytics are fixed GROUP BYs) but first-class engine surface —
    and, unlike most streaming-native windows, exactly SQL-expressible
    (gaps-and-islands), so the DuckDB twin is a full hash check.

    Scale: one shuffle on user_id; Spark merges sessions inside the
    aggregation (no self-join, no window-sort over the whole table beyond
    the per-user ordering the session merge needs)."""
    gap = f"{gap_minutes} minutes"
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            # integer-cents accumulation: double sums associate differently
            # across engines/partial-agg orders and can flip the 2-dp round
            # at x.xx5 (CLAUDE.md invariant; same trick as w2)
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0).alias(
                "session_value"
            ),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
