"""Bound checks for approximate operators that cannot hash-match an exact
oracle (SURVEY.md §2: agg_approx_distinct)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aind_data_transformation_spark.io.sources import load_table
from aind_data_transformation_spark.queries.aggregates import q_agg_approx_distinct
from tests.conftest import TEST_SF_DIR


def test_approx_count_distinct_within_rsd(spark):
    approx = {
        r["l_returnflag"]: r["approx_parts"]
        for r in q_agg_approx_distinct(spark, TEST_SF_DIR).collect()
    }
    exact = {
        r["l_returnflag"]: r["exact"]
        for r in load_table(spark, TEST_SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, est in approx.items():
        rel_err = abs(est - exact[flag]) / max(exact[flag], 1)
        assert rel_err < 0.1, f"{flag}: approx {est} vs exact {exact[flag]}"
