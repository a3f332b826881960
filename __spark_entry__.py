"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship medallion query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full catalog from
``emr_hudi_example_spark.catalog`` (one entry per implemented operator
from SURVEY.md §2 + extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emr_hudi_example_spark import all_queries, catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.flagship_dwd_dm(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(all_queries.Q)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (same column names)."""
    return dict(all_queries.ORACLE)
