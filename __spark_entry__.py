"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check (flagship query at sf0.001);
``queries()``/``oracle_sql()`` expose the engine's operator inventory
(SURVEY.md §2 Part B) for the DuckDB-oracle correctness gate.

Implementation lives in ``aind_data_transformation_spark/queries/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aind_data_transformation_spark.queries import registry  # noqa: E402

_QUERIES, _ORACLES = registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return _QUERIES["agg_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return dict(_ORACLES)
