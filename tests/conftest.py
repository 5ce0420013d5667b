"""Shared fixtures: one SparkSession per test session, a DuckDB oracle
connection per scale factor, and the driver-equivalent compare helper."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aind_data_transformation_spark.io.sources import TABLES, table_path
from aind_data_transformation_spark.session import build_session

#: sf used by local oracle tests; the driver gate runs sf0.01 — run
#: ``SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 pytest`` before committing.
TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="engine-tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(TEST_SF_DIR, t)}')"
        )
    yield con
    con.close()


def canon_value(v):
    """Canonicalize one cell for order-insensitive exact comparison,
    neutralizing dtype differences (int32/int64/float64, Decimal, numpy
    scalars, timestamps) the two engines disagree on."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "<null>"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, decimal.Decimal):
        f = float(v)
        return canon_value(int(f)) if f == int(f) else repr(f)
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_value(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def strict_canon(v):
    """Like :func:`canon_value` but preserves the representation drifts the
    driver's hash is sensitive to: DATE vs TIMESTAMP stay distinct (the
    pandas path coerces both to datetime64 and goes blind to it)."""
    import datetime

    if isinstance(v, datetime.datetime):
        return "ts:" + v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, datetime.date):
        return "date:" + v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(strict_canon(x)) for x in v) + "]"
    return canon_value(v)


def canon_frame(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(canon_value(row[c]) for c in cols)
        for _, row in pdf[cols].iterrows()
    ]
    return sorted(rows)


def assert_matches_oracle(spark_df, con, sql, label=""):
    """Replicates the driver's check: row count + column-name set +
    order-insensitive exact value comparison (columns sorted by name)."""
    pdf_s = spark_df.toPandas()
    pdf_o = con.execute(sql).fetchdf()
    assert sorted(pdf_s.columns) == sorted(pdf_o.columns), (
        f"{label}: column mismatch {sorted(pdf_s.columns)} vs {sorted(pdf_o.columns)}"
    )
    assert len(pdf_s) == len(pdf_o), (
        f"{label}: row count {len(pdf_s)} vs oracle {len(pdf_o)}"
    )
    rows_s, rows_o = canon_frame(pdf_s), canon_frame(pdf_o)
    if rows_s != rows_o:
        diff_s = [r for r in rows_s if r not in rows_o][:5]
        diff_o = [r for r in rows_o if r not in rows_s][:5]
        raise AssertionError(
            f"{label}: value mismatch.\n spark-only: {diff_s}\n oracle-only: {diff_o}"
        )
    # Representation-drift checks the pandas path is blind to but the
    # driver's value hash is not (VERDICT r1: HUGEINT/DATE drifts):
    # 1. DuckDB HUGEINT (count_if / SUM(BIGINT)) lands as float64 while
    #    Spark BIGINT lands as int64 -> str(123.0) != str(123) in the hash.
    for c in pdf_s.columns:
        ks, ko = pdf_s[c].dtype.kind, pdf_o[c].dtype.kind
        if (
            {ks, ko} <= {"i", "u", "f"}
            and (ks == "f") != (ko == "f")
            and not pdf_s[c].isna().any()
            and not pdf_o[c].isna().any()
        ):
            raise AssertionError(
                f"{label}: int/float dtype drift on column {c!r} "
                f"(spark {pdf_s[c].dtype} vs oracle {pdf_o[c].dtype}) — "
                "likely DuckDB HUGEINT; CAST the oracle aggregate to BIGINT"
            )
    # 2. DuckDB date_trunc returns DATE while Spark returns TIMESTAMP;
    #    compare raw rows where date objects stay dates.
    raw_s = sorted(
        tuple(strict_canon(v) for v in row) for row in spark_df.collect()
    )
    cur = con.execute(sql)
    ocols = [d[0] for d in cur.description]
    order = [ocols.index(c) for c in spark_df.columns]
    raw_o = sorted(
        tuple(strict_canon(row[i]) for i in order) for row in cur.fetchall()
    )
    if raw_s != raw_o:
        diff_s = [r for r in raw_s if r not in raw_o][:3]
        diff_o = [r for r in raw_o if r not in raw_s][:3]
        raise AssertionError(
            f"{label}: raw-representation mismatch (values equal in pandas "
            f"but typed representation drifts — DATE vs TIMESTAMP?).\n"
            f" spark-only: {diff_s}\n oracle-only: {diff_o}"
        )
