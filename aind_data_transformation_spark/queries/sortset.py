"""Sort / limit / top-k and set operations (SURVEY.md §2 Part B).

``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — a per-
partition top-k plus a k-row driver merge, no global sort shuffle; that is
the plan that survives 100 TB. Every sort used with a limit carries a
unique tiebreak column so the selected row *set* is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aind_data_transformation_spark.io.sources import load_table


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global order + limit => TakeOrderedAndProject (check .explain)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q_sort_multi_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null placement; nulls are synthesized
    via nullif since the source has none."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("prio_or_null"),
            "o_totalprice",
        )
        .orderBy(
            F.asc_nulls_last("prio_or_null"),
            F.desc_nulls_first("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .limit(25)
    )


def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL multiplicity + UNION dedup in one result: customers with
    open orders vs customers with high-value orders."""
    o = load_table(spark, sf_dir, "orders")
    open_custs = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    big_custs = o.where(F.col("o_totalprice") > 250000.0).select("o_custkey")
    unioned = open_custs.unionByName(big_custs)  # UNION ALL semantics
    return unioned.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_appearances")
    )


def q_set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct variants), tagged and re-unioned so one
    result covers both."""
    o = load_table(spark, sf_dir, "orders")
    f_custs = o.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_custs = o.where(F.col("o_orderstatus") == "O").select("o_custkey")
    both = f_custs.intersect(o_custs).withColumn("tag", F.lit("in_both"))
    f_only = f_custs.subtract(o_custs).withColumn("tag", F.lit("f_only"))
    return both.unionByName(f_only)


def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    duplicates carry multiplicity — min(m, n) copies survive an
    intersect-all, max(m - n, 0) an except-all. Spark's
    ``intersectAll``/``exceptAll`` compile to the same partial+final
    aggregation-on-multiplicity shape the SQL standard prescribes; no
    distinct pass anywhere, so multiplicities never collapse.

    Scale: both ops are one hash shuffle of (key, side) with counts —
    the multiplicity arithmetic is aggregation, not a join."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") <= 25).select("l_suppkey")
    b = li.where(F.col("l_discount") >= 0.05).select("l_suppkey")
    inter = a.intersectAll(b).withColumn("tag", F.lit("inter_all"))
    exc = a.exceptAll(b).withColumn("tag", F.lit("except_all"))
    return (
        inter.unionByName(exc)
        .groupBy("l_suppkey", "tag")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


QUERIES = {
    "sort_limit": q_sort_limit,
    "sort_multi_null": q_sort_multi_null,
    "set_union": q_set_union,
    "set_intersect_except": q_set_intersect_except,
    "set_ops_all": q_set_ops_all,
}

ORACLES = {
    "set_ops_all": """
        WITH a AS (
            SELECT l_suppkey FROM lineitem WHERE l_quantity <= 25
        ), b AS (
            SELECT l_suppkey FROM lineitem WHERE l_discount >= 0.05
        ), inter AS (
            SELECT l_suppkey, 'inter_all' AS tag
            FROM (SELECT l_suppkey FROM a INTERSECT ALL
                  SELECT l_suppkey FROM b)
        ), exc AS (
            SELECT l_suppkey, 'except_all' AS tag
            FROM (SELECT l_suppkey FROM a EXCEPT ALL
                  SELECT l_suppkey FROM b)
        )
        SELECT l_suppkey, tag, count(*) AS multiplicity
        FROM (SELECT * FROM inter UNION ALL SELECT * FROM exc)
        GROUP BY l_suppkey, tag
    """,
    "sort_limit": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    "sort_multi_null": """
        SELECT o_orderkey,
               nullif(o_orderpriority, '3-MEDIUM') AS prio_or_null,
               o_totalprice
        FROM orders
        ORDER BY prio_or_null ASC NULLS LAST,
                 o_totalprice DESC NULLS FIRST,
                 o_orderkey ASC
        LIMIT 25
    """,
    "set_union": """
        SELECT o_custkey, COUNT(*) AS n_appearances
        FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            UNION ALL
            SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0
        )
        GROUP BY o_custkey
    """,
    "set_intersect_except": """
        SELECT o_custkey, 'in_both' AS tag FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        UNION ALL
        SELECT o_custkey, 'f_only' AS tag FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
    """,
}
