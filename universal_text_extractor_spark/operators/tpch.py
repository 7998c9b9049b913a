"""TPC-H-ish relational queries over the driver testdata (TESTDATA.md).

The reference itself has no joins (SURVEY.md §2.5); these exercise the
engine breadth the driver harness grades — multi-way joins, broadcast
dimensions, semi/anti patterns, windows — adapted to the columns the
synthetic tables actually have.

Scale notes per query:
- FIXED-size dimensions (region: 5 rows, nation: 25 rows — constant at
  every scale factor) are broadcast explicitly: the hint is always right
  for them and removes any fact-side shuffle for those joins.
- SCALE-PROPORTIONAL tables (customer/supplier/part grow with SF) carry NO
  broadcast hint: at 100× the data a forced broadcast OOMs the executors,
  so the decision is left to size statistics + AQE, which broadcast them
  while they fit and fall back to a shuffled hash join when they don't.
  (Round-1 forced these; de-broadcast per VERDICT.md item 2.)
- the only other explicit broadcast is q22's 1-row scalar-subquery result.
- fact-fact joins (orders⋈lineitem) shuffle on the join key once; aggs are
  partial map-side first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1 shape: one scan, map-side partial agg."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(customer, orders, lineitem) -> DataFrame:
    """TPC-H Q3 shape: shuffle orders⋈lineitem; customer is
    scale-proportional so its join strategy is left to size stats/AQE."""
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .join(
            orders.filter(
                F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(region, nation, customer, supplier, orders, lineitem) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. Fixed dims (nation/region) broadcast;
    customer/supplier left to AQE (they grow with SF)."""
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg — the pushdown showcase."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


def q10_returned_items(customer, orders, lineitem, nation) -> DataFrame:
    """TPC-H Q10 shape."""
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue(lineitem, part) -> DataFrame:
    """TPC-H Q14 shape: conditional agg over a joined dim (part grows
    with SF — join strategy left to AQE)."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("p_type").startswith("PROMO"), disc_price).otherwise(
                        0.0
                    )
                )
                * 100.0
                / F.sum(disc_price),
                4,
            ).alias("promo_revenue")
        )
    )


def q18_large_volume_customer(customer, orders, lineitem, qty_threshold: int = 150) -> DataFrame:
    """TPC-H Q18 shape: agg-filtered semi join (HAVING via join)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > qty_threshold)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(20)
    )


def top_orders_per_segment(customer, orders, k: int = 3) -> DataFrame:
    """Window-function coverage (ranking within partition) — absent from the
    reference (SURVEY.md §2.5) but first-class engine surface."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "c_mktsegment",
            "rk",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


def customers_without_orders(customer, orders) -> DataFrame:
    """Anti-join coverage (the checkpoint-resume primitive, exercised
    relationally)."""
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .agg(F.count("*").alias("inactive_customers"))
    )


def q4_order_priority(orders, lineitem) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join (no row multiplication from
    the many-lineitem side), then a small group-by. At scale the semi join
    shuffles both sides once on orderkey; no dim to broadcast. (Adapted to
    the testdata columns: EXISTS(returned lineitem) instead of
    commit<receipt, which the synthetic lineitem does not carry.)"""
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q12_shipmode_priority(orders, lineitem) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + conditional (CASE) aggregation —
    the two counts come out of ONE pass (no second scan/join). (Adapted:
    grouped by l_linestatus instead of the absent l_shipmode.)"""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q19_disjunctive_revenue(lineitem, part) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across two tables — the
    disjunction references both sides, so it must stay a post-join filter,
    but each disjunct's single-side conjuncts (brand/size, quantity
    ranges) still prune on the part side before the join (strategy left
    to AQE — part grows with SF)."""
    j = lineitem.join(
        part, F.col("l_partkey") == F.col("p_partkey")
    ).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
            & (F.col("p_size") <= 15)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 40)
            & (F.col("p_size") <= 25)
        )
    )
    return j.agg(
        F.round(
            F.coalesce(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                F.lit(0.0),
            ),
            2,
        ).alias("revenue")
    )


def q22_global_sales_opportunity(customer, orders) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (avg balance) + anti join
    (customers with no orders), grouped by country code. The scalar avg is
    a 1-row broadcast; the anti join shuffles once on custkey."""
    cc = F.substring(F.col("c_name"), -2, 2).alias("cntrycode")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = (
        customer.select("c_custkey", "c_acctbal", cc)
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
    )
    return (
        rich.join(
            orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def rolling_order_stats(orders, days: int = 7) -> DataFrame:
    """Window breadth: per-customer running order count and a date-ROWS
    moving average of o_totalprice (ordered by date then key for
    determinism). One shuffle on the window partition key."""
    w_seq = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    w_avg = w_seq.rowsBetween(-(days - 1), 0)
    # exact integer-cents accumulation: double window-sums associate
    # differently across engines (DuckDB's segment tree vs a running sum)
    # and flip the cent rounding — BIGINT cents are fold-order-proof, and
    # floor (not round) of the exact-operand division sidesteps the
    # HALF_UP-vs-binary-round divergence at x.xx5 boundaries
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(w_seq).alias("order_seq"),
        (
            F.floor(
                F.sum(cents).over(w_avg).cast("double")
                / F.count("*").over(w_avg)
            )
            / F.lit(100.0)
        ).alias("moving_avg_price"),
        F.round(
            F.col("o_totalprice")
            - F.coalesce(
                F.lag("o_totalprice", 1).over(w_seq), F.col("o_totalprice")
            ),
            2,
        ).alias("delta_vs_prev"),
    )


def lang_rollup(documents) -> DataFrame:
    """Grouping-set breadth: ROLLUP(lang, source) doc counts — subtotal and
    grand-total rows in one pass (partial aggregation still applies)."""
    return (
        documents.rollup("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy(
            F.asc_nulls_first("lang"), F.asc_nulls_first("source")
        )
    )


def lang_source_cube(documents) -> DataFrame:
    """CUBE(lang, source): all four grouping combinations (full, per-lang,
    per-source, grand total) in one pass — the cross-tab companion to
    :func:`lang_rollup`."""
    return (
        documents.cube("lang", "source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.asc_nulls_first("lang"), F.asc_nulls_first("source"))
    )
