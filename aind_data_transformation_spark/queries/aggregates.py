"""Aggregation operators (SURVEY.md §2 Part B "Aggregations").

All money aggregates use the integer-cents scheme from ``numeric.py`` so
values hash-match the DuckDB oracle exactly. Every groupBy here compiles to
Spark's partial (map-side) + final hash aggregate — one shuffle on the
grouping keys, no sort — which is the scalable plan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aind_data_transformation_spark.io.sources import load_table
from aind_data_transformation_spark.queries.numeric import (
    cents,
    money_avg,
    money_sum,
    sql_cents,
    sql_money_avg,
    sql_money_sum,
)

_SHIP_CUTOFF = "1998-09-02"


def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the engine's flagship query.

    Scan lineitem -> pushed-down ship-date filter -> hash aggregate on
    (l_returnflag, l_linestatus). disc_price/charge are computed in scaled
    integer space (cents x 1e2 x 1e2) and divided back once at the end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty, price = cents("l_quantity"), cents("l_extendedprice")
    disc, tax = cents("l_discount"), cents("l_tax")
    return (
        li.where(F.col("l_shipdate") <= F.lit(_SHIP_CUTOFF).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty).cast("double") / F.lit(100.0)).alias("sum_qty"),
            (F.sum(price).cast("double") / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(price * (100 - disc)).cast("double") / F.lit(1.0e4)).alias(
                "sum_disc_price"
            ),
            (
                F.sum(price * (100 - disc) * (100 + tax)).cast("double")
                / F.lit(1.0e6)
            ).alias("sum_charge"),
            (F.sum(qty).cast("double") / F.lit(100.0) / F.count(F.col("l_quantity"))).alias(
                "avg_qty"
            ),
            (
                F.sum(price).cast("double")
                / F.lit(100.0)
                / F.count(F.col("l_extendedprice"))
            ).alias("avg_price"),
            (
                F.sum(disc).cast("double") / F.lit(100.0) / F.count(F.col("l_discount"))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_QTY = sql_cents("l_quantity")
_PRICE = sql_cents("l_extendedprice")
_DISC = sql_cents("l_discount")
_TAX = sql_cents("l_tax")

_AGG_GROUP_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM({_QTY}) AS DOUBLE) / 100.0 AS sum_qty,
  CAST(SUM({_PRICE}) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM({_PRICE} * (100 - {_DISC})) AS DOUBLE) / 1e4 AS sum_disc_price,
  CAST(SUM({_PRICE} * (100 - {_DISC}) * (100 + {_TAX})) AS DOUBLE) / 1e6 AS sum_charge,
  CAST(SUM({_QTY}) AS DOUBLE) / 100.0 / COUNT(l_quantity) AS avg_qty,
  CAST(SUM({_PRICE}) AS DOUBLE) / 100.0 / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM({_DISC}) AS DOUBLE) / 100.0 / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

QUERIES = {
    "agg_group": q_agg_group,
}

ORACLES = {
    "agg_group": _AGG_GROUP_SQL,
}
