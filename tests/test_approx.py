"""Bound checks for approximate operators that cannot hash-match an exact
oracle (SURVEY.md §2: agg_approx_distinct)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aind_data_transformation_spark.io.sources import load_table
from aind_data_transformation_spark.queries.aggregates import (
    q_agg_approx_distinct,
    q_agg_hll_sketch,
)
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


def test_hll_sketch_union_estimate_within_bounds(spark):
    """The merged (union-of-per-group-sketches) estimate must land inside
    HLL's error envelope of the global exact distinct count — this is the
    mergeability property the operator exists for."""
    row = q_agg_hll_sketch(spark, TEST_SF_DIR).collect()[0]
    li = load_table(spark, TEST_SF_DIR, "lineitem")
    exact = li.agg(F.countDistinct("l_partkey").alias("n")).collect()[0]["n"]
    n_rows = li.count()
    assert row["n_rows"] == n_rows
    rel_err = abs(row["approx_parts_total"] - exact) / max(exact, 1)
    assert rel_err < 0.05, f"hll union {row['approx_parts_total']} vs {exact}"
