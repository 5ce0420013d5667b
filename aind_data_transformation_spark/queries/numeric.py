"""Oracle-exact numeric helpers.

The driver hash-compares Spark results against DuckDB bit-for-bit, but a
``SUM(double)`` is neither deterministic across runs (partial-aggregation
order varies with partitioning) nor reproducible across engines. The money
columns in the driver tables are 2-decimal values stored as doubles (max
observed deviation from an exact 2-decimal value: ~4e-9, verified on
sf0.001), so the engine aggregates them in **integer cents**:

  double -> round(x*100) -> BIGINT  (exact, associative, order-independent)

Sums/products of cents are exact 64-bit integer arithmetic in both engines;
the final division back to dollars is a single identical double operation on
identical operands, hence bit-identical. Averages are expressed as
``CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT`` — same operation order on
both sides, never a bare ``AVG(double)``.

This is also the right 100-TB answer, not just an oracle trick: integer
aggregation stays in whole-stage codegen, needs no decimal-128 math, and
makes map-side partial aggregation exactly associative.

Overflow headroom: cents ~1e7; cents*(100-disc)*(100+tax) ~1e11 per row;
int64 holds ~9.2e18, so ~9e7 rows per *partial* aggregate of the triple
product — fine at any realistic partition size. For full-table sums beyond
that, switch the final cast to DECIMAL(38,0) (Spark) / HUGEINT (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def cents(col: str | Column) -> Column:
    """Money double -> exact integer cents (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def sql_cents(expr: str) -> str:
    """Money double -> exact integer cents (DuckDB side)."""
    return f"CAST(round(({expr})*100) AS BIGINT)"


def money_sum(col: str | Column) -> Column:
    """SUM of a 2-decimal money column, bit-identical to
    ``sql_money_sum`` on the oracle side."""
    return F.sum(cents(col)).cast("double") / F.lit(100.0)


def sql_money_sum(expr: str) -> str:
    return f"CAST(SUM({sql_cents(expr)}) AS DOUBLE) / 100.0"


def money_avg(col: str | Column) -> Column:
    """AVG of a 2-decimal money column; division order matches
    ``sql_money_avg`` exactly (sum -> /100.0 -> /count)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(cents(c)).cast("double") / F.lit(100.0) / F.count(c)


def sql_money_avg(expr: str) -> str:
    return (
        f"CAST(SUM({sql_cents(expr)}) AS DOUBLE) / 100.0 / COUNT({expr})"
    )
