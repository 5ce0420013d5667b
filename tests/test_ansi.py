"""ANSI-mode guarantee (r7 verdict item #4).

The registry's exactness story leans on integer-grid arithmetic (cents
sums, scaled distances, hash folds). ANSI mode is the cheap proof none
of it silently relies on overflow wrap-around or lossy casts: under
``spark.sql.ansi.enabled=true`` those throw instead of corrupting.

Spark 4 defaults ANSI ON, and ``session.RUNTIME_CONFS`` now pins it
explicitly — so the ENTIRE suite (every oracle key in test_oracle.py,
every property test, the sf0.1 cross-scale sweep) already runs under
ANSI semantics. These tests pin that fact so a future conf change or a
caller-owned session can't silently turn the guarantee off:

1. the shared test session really is in ANSI mode;
2. ANSI is live, not a no-op name — an overflow/bad-cast canary throws;
3. ``apply_runtime_confs`` (the entry-point defense used when the
   driver owns the session) re-enables ANSI on a session built with it
   off.
"""

from __future__ import annotations

import pytest

from aind_data_transformation_spark.session import RUNTIME_CONFS, apply_runtime_confs


def test_session_runs_ansi(spark):
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    assert RUNTIME_CONFS["spark.sql.ansi.enabled"] == "true"


def test_ansi_is_live_overflow_throws(spark):
    """The canary: if this stops throwing, the suite's green no longer
    proves overflow-safety and the ANSI sweep claim is void."""
    with pytest.raises(Exception, match="(?i)overflow|ARITHMETIC_OVERFLOW"):
        spark.sql(
            "SELECT CAST(9223372036854775807 AS BIGINT) + CAST(1 AS BIGINT)"
        ).collect()
    with pytest.raises(Exception, match="(?i)cast|invalid"):
        spark.sql("SELECT CAST('not a number' AS INT)").collect()


def test_runtime_confs_reassert_ansi(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        apply_runtime_confs(spark)
        assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


# ---------------------------------------------------------------------------
# knuth32 / knuth32_sql: the overflow-safe 32-bit multiplicative hash
# (r8 ADVICE: the naive `id * 2654435761` throws ARITHMETIC_OVERFLOW under
# the pinned ANSI mode once id exceeds ~3.47e9 — exactly the
# multi-billion-row id space a 100-TB corpus has).
# ---------------------------------------------------------------------------

_KNUTH_PROBES = [
    0, 1, 7, 65535, 65536, 12345678,
    3474749038,           # first id where the naive product overflows
    4294967295, 4294967296, 10**12, 2**62,
]


def test_knuth32_matches_python_past_int64_overflow(spark):
    """Both the Column and the Spark-SQL forms equal the exact Python
    value (which never overflows) at every probe, INCLUDING ids where
    the naive product exceeds int64 — the inputs that used to crash."""
    from pyspark.sql import functions as F

    from aind_data_transformation_spark.ops import knuth32, knuth32_sql

    df = spark.createDataFrame([(v,) for v in _KNUTH_PROBES], "x long")
    rows = df.select(
        "x",
        F.expr(knuth32_sql("x", "spark")).alias("s"),
        knuth32(F.col("x")).alias("c"),
    ).collect()
    for r in rows:
        ref = (r["x"] * 2654435761) % 4294967296
        assert r["s"] == ref and r["c"] == ref, (r["x"], r["s"], r["c"], ref)


def test_knuth32_duck_dialect_matches_python():
    import duckdb

    from aind_data_transformation_spark.ops import knuth32_sql

    con = duckdb.connect()
    for v in _KNUTH_PROBES:
        got = con.execute(f"SELECT {knuth32_sql(str(v), 'duck')}").fetchone()[0]
        assert got == (v * 2654435761) % 4294967296, (v, got)
