"""Query registry — the driver-contract implementation of SURVEY.md §2.

Each entry pairs a Spark builder ``(spark, sf_dir) -> DataFrame`` with
an equivalent DuckDB oracle SQL string (None for genuinely
non-SQL-expressible ops).  Naming/rounding rules: every computed column
is aliased identically on both sides; double aggregates are rounded
(2 dp money, 6 dp ratios) so hash comparison is FP-stable; timestamps
in results are cast to DATE or epoch millis on both sides.

Scale notes are inline per query — at 100 TB the dimension side of
every join here broadcasts (customer/supplier/nation/region are orders
of magnitude smaller than facts), aggregations are partial+final
(map-side combine is automatic for all ``F.sum/count/avg``), and window
queries partition on high-cardinality keys so no single partition
explodes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hive_scd_spark.scd import apply_statements

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as long nanos.
    Expose both the raw nanos (exact) and a micros-precision timestamp."""
    ev = t(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    else:  # pragma: no cover — future driver versions may store micros
        ev = ev.withColumn("ts_ns", F.unix_micros("ts") * 1000)
    return ev


# ---------------------------------------------------------------------------
# SCD layer queries (SURVEY §2.A) — the reference's own capability,
# exercised on the `customer` dimension with a three-statement script.
# ---------------------------------------------------------------------------

CUSTOMER_SCRIPT = """\
UPDATE customer SET c_mktsegment = 'MACHINERY' WHERE c_mktsegment = 'AUTOMOBILE';
-- time=2024-03-01
UPDATE customer SET c_acctbal = c_acctbal + 100.0 WHERE c_acctbal < 0;
-- time=2024-06-01
DELETE FROM customer WHERE c_custkey % 7 = 0;
"""

# DuckDB replications of the compiled statement chain (CASE-expression
# form — exactly what our engine compiles to, SURVEY §3.4).
_ORACLE_CUST_MID = """
SELECT c_custkey, c_name, c_nationkey,
       CASE WHEN c_acctbal < 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
       CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment
FROM customer
"""

_ORACLE_CUST_NOW = _ORACLE_CUST_MID + " WHERE NOT (c_custkey % 7 = 0)"


def scd_customer_asof_raw(spark, sf_dir):
    """as_of=-1 → raw data, no statements apply (README.md:196-212)."""
    return apply_statements(t(spark, sf_dir, "customer"), CUSTOMER_SCRIPT, as_of=-1)


def scd_customer_asof_mid(spark, sf_dir):
    """as_of between stmt2 and stmt3 → UPDATEs apply, DELETE doesn't."""
    return apply_statements(
        t(spark, sf_dir, "customer"), CUSTOMER_SCRIPT, as_of="2024-04-01"
    )


def scd_customer_asof_now(spark, sf_dir):
    """as_of=now → all three statements apply."""
    return apply_statements(t(spark, sf_dir, "customer"), CUSTOMER_SCRIPT, as_of=None)


_CHAIN_SCRIPT = """\
UPDATE customer SET c_acctbal = c_acctbal + c_nationkey, c_nationkey = c_nationkey + 1
  WHERE c_acctbal > 1000;
UPDATE customer SET c_acctbal = -c_acctbal WHERE c_nationkey = 5;
"""


def scd_update_chain_preimage(spark, sf_dir):
    """Pre-image SET semantics within a statement + cross-statement
    chaining (SURVEY §3.4 subtlety; reference H2 replay order
    SQLUpdater.java:167-169)."""
    return apply_statements(t(spark, sf_dir, "customer"), _CHAIN_SCRIPT, as_of=None)


def scd_customer_orders_revenue(spark, sf_dir):
    """Flagship: as-of dimension joined to facts — revenue per
    (post-update) market segment.  The dimension side broadcasts: at
    100 TB the fact scan never shuffles for this join."""
    cust = apply_statements(t(spark, sf_dir, "customer"), CUSTOMER_SCRIPT, as_of=None)
    orders = t(spark, sf_dir, "orders")
    return (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
            "inner",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Host-delegated SQL surface (SURVEY §2.B) — Hive provided this over the
# reference's InputFormat; Spark SQL provides it here.  One query per
# capability row, DuckDB-oracle-checked.
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan+filter+groupBy agg (partial+final, codegen)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
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
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark, sf_dir):
    """3-way join + agg + deterministic top-10 (order w/ tiebreaks)."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= "1996-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_revenue(spark, sf_dir):
    """6-table star join; all dimensions broadcast, single fact shuffle."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q6_revenue_forecast(spark, sf_dir):
    """Pure filter + single global agg — fully pushed-down scan."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


def agg_rollup_returnflag(spark, sf_dir):
    """ROLLUP grouping sets (subtotals + grand total)."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem_v
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """
    )


def window_topk_parts_per_brand(spark, sf_dir):
    """Per-group top-k via row_number window (deterministic tiebreak)."""
    part = t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rk")
    )


def window_running_supplier_revenue(spark, sf_dir):
    """Running sum per supplier — frame order fully determined, so FP
    accumulation order (and thus the hash) matches any engine."""
    li = t(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # integer-exact accumulation: engines differ both in FP summation
    # strategy and in double→decimal rounding mode, so running doubles
    # drift at the cent.  floor(x*100 + 0.5) is a pure double op with
    # one IEEE answer everywhere; bigint sums are exact.
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    ).cast("bigint")
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(cents).over(w).alias("running_revenue_cents"),
    )


def join_anti_customers_without_orders(spark, sf_dir):
    """Anti join (NOT EXISTS): customers with no orders before 1996."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1996-01-01")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def setop_intersect_custkeys(spark, sf_dir):
    """INTERSECT set operation: customers ordering in both periods."""
    orders = t(spark, sf_dir, "orders")
    early = orders.filter(F.col("o_orderdate") < "1997-01-01").select("o_custkey")
    late = orders.filter(F.col("o_orderdate") >= "1999-01-01").select("o_custkey")
    return early.intersect(late).withColumnRenamed("o_custkey", "custkey")


def pivot_nation_by_segment(spark, sf_dir):
    """Pivot: customer counts per nation × market segment."""
    cust = t(spark, sf_dir, "customer")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    out = (
        cust.groupBy("c_nationkey")
        .pivot("c_mktsegment", segs)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for empty cells; normalize to 0 like the CASE oracle
    return out.select(
        "c_nationkey", *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in segs]
    )


def events_sessionize(spark, sf_dir):
    """Sessionization: 30-min inactivity gap → session count per user.
    Partition key = user_id (high-cardinality at scale); single window
    pass, no self-join."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    gap_ns = F.col("ts_ns") - F.lag("ts_ns").over(w)
    new_sess = F.when(
        gap_ns.isNull() | (gap_ns > 30 * 60 * 1_000_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


ORACLES: dict[str, str] = {
    "scd_customer_asof_raw": "SELECT * FROM customer",
    "scd_customer_asof_mid": _ORACLE_CUST_MID,
    "scd_customer_asof_now": _ORACLE_CUST_NOW,
    "scd_update_chain_preimage": """
        WITH s1 AS (
          SELECT c_custkey, c_name,
                 CASE WHEN c_acctbal > 1000 THEN c_nationkey + 1 ELSE c_nationkey END AS c_nationkey,
                 CASE WHEN c_acctbal > 1000 THEN c_acctbal + c_nationkey ELSE c_acctbal END AS c_acctbal,
                 c_mktsegment
          FROM customer)
        SELECT c_custkey, c_name, c_nationkey,
               CASE WHEN c_nationkey = 5 THEN -c_acctbal ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM s1
    """,
    "scd_customer_orders_revenue": """
        WITH cust AS (
          SELECT c_custkey,
                 CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'MACHINERY' ELSE c_mktsegment END AS c_mktsegment
          FROM customer WHERE NOT (c_custkey % 7 = 0))
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders JOIN cust ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               ROUND(AVG(l_extendedprice), 6) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey, o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier_revenue": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name
    """,
    "q6_revenue_forecast": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "agg_rollup_returnflag": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "window_topk_parts_per_brand": """
        SELECT p_brand, p_partkey, p_name, p_retailprice, rk FROM (
          SELECT p_brand, p_partkey, p_name, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey ASC) AS rk
          FROM part) WHERE rk <= 3
    """,
    "window_running_supplier_revenue": """
        SELECT l_suppkey, l_orderkey, l_linenumber,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_revenue_cents
        FROM lineitem
    """,
    "join_anti_customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
    """,
    "setop_intersect_custkeys": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
    """,
    "pivot_nation_by_segment": """
        SELECT c_nationkey,
               SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS "AUTOMOBILE",
               SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS "BUILDING",
               SUM(CASE WHEN c_mktsegment = 'FURNITURE' THEN 1 ELSE 0 END) AS "FURNITURE",
               SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD' THEN 1 ELSE 0 END) AS "HOUSEHOLD",
               SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) AS "MACHINERY"
        FROM customer GROUP BY c_nationkey
    """,
    "events_sessionize": """
        WITH g AS (
          SELECT user_id,
                 CASE WHEN epoch_ns(ts) - epoch_ns(LAG(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000000
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_sess
          FROM events)
        SELECT user_id, SUM(new_sess) AS n_sessions, COUNT(*) AS n_events
        FROM g GROUP BY user_id
    """,
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "scd_customer_asof_raw": scd_customer_asof_raw,
    "scd_customer_asof_mid": scd_customer_asof_mid,
    "scd_customer_asof_now": scd_customer_asof_now,
    "scd_update_chain_preimage": scd_update_chain_preimage,
    "scd_customer_orders_revenue": scd_customer_orders_revenue,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_revenue": q5_local_supplier_revenue,
    "q6_revenue_forecast": q6_revenue_forecast,
    "agg_rollup_returnflag": agg_rollup_returnflag,
    "window_topk_parts_per_brand": window_topk_parts_per_brand,
    "window_running_supplier_revenue": window_running_supplier_revenue,
    "join_anti_customers_without_orders": join_anti_customers_without_orders,
    "setop_intersect_custkeys": setop_intersect_custkeys,
    "pivot_nation_by_segment": pivot_nation_by_segment,
    "events_sessionize": events_sessionize,
}
