"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship SCD query on /root/testdata/sf0.001.
queries()      — one entry per implemented operator from SURVEY.md §2
                 (and the LLM-pipeline extensions), (spark, sf_dir) → DataFrame.
oracle_sql()   — DuckDB-equivalent ANSI SQL per query (omitted only for
                 genuinely non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_scd_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: as-of SCD dimension (customer + 3-statement .updates
    script) joined to orders, revenue per post-update market segment."""
    return QUERIES["scd_customer_orders_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
