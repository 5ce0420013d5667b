"""The primary correctness gate, run locally: every registered query key is
executed on Spark and compared against its DuckDB oracle exactly the way the
driver does (SURVEY.md §5.2.2)."""

from __future__ import annotations

import pytest

from aind_data_transformation_spark.queries import registry
from tests.conftest import TEST_SF_DIR, assert_matches_oracle

QUERIES, ORACLES = registry()


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_query_against_oracle(key, spark, oracle):
    df = QUERIES[key](spark, TEST_SF_DIR)
    if key in ORACLES:
        assert_matches_oracle(df, oracle, ORACLES[key], label=key)
    else:
        # rows-only contract: must execute and be deterministic in count
        assert df.count() == df.count()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "avg_qty",
        "avg_price",
        "avg_disc",
        "count_order",
    ]


def test_registry_consistency():
    assert set(ORACLES) <= set(QUERIES)
    assert QUERIES, "registry must not be empty"
