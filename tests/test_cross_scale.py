"""Full-registry cross-scale exactness sweep (r5 verdict items #2/#7).

Every oracle-backed registry key is executed on Spark AND its DuckDB
oracle at a scale factor OTHER than the driver's sf0.01 gate, and the
results compared with the driver's semantics (row count + column names +
order-insensitive canonical values). This is the only systematic guard
against scale-dependent constants the fixed-SF gate can't see (e.g. a
bucket count tuned to 500 rows, a LIMIT that silently truncates at 2000).

Gated behind an env var because the sweep is minutes, not seconds:

    SPARK_GRAFT_CROSS_SCALE_DIR=/root/testdata/sf0.1 \
        python -m pytest tests/test_cross_scale.py -q

The committed CROSS_SCALE.md records the last full run; re-generate it
with ``CHECK_SF_DIR=/root/testdata/sf0.1 python tools/check_keys.py
--all`` (same compare core).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tests.conftest import assert_matches_oracle

CROSS_DIR = os.environ.get("SPARK_GRAFT_CROSS_SCALE_DIR")

pytestmark = pytest.mark.skipif(
    not CROSS_DIR,
    reason="set SPARK_GRAFT_CROSS_SCALE_DIR=/root/testdata/sf0.1 to run "
    "the full-registry cross-scale sweep",
)

_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _registry():
    from aind_data_transformation_spark.queries import registry

    return registry()


def _keys():
    if not CROSS_DIR:
        return []
    q, o = _registry()
    return sorted(k for k in q if k in o)


@pytest.fixture(scope="module")
def cross_oracle():
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{CROSS_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", _keys())
def test_cross_scale_key(spark, cross_oracle, key):
    q, o = _registry()
    assert_matches_oracle(
        q[key](spark, CROSS_DIR), cross_oracle, o[key], label=f"{key}@{CROSS_DIR}"
    )
