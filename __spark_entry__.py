"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper around sentometrics_spark.entry_queries — one entry per
implemented operator from SURVEY.md §2, each with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from sentometrics_spark import entry_queries as _eq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full sento_measures
    pipeline (lexicon scoring -> doc aggregation -> gap fill -> rolling
    almon kernels)."""
    return _eq.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _eq.queries()


def oracle_sql() -> dict[str, str]:
    return _eq.oracle_sql()
