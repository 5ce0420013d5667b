"""TPC-H queries 4/7/8/9/13/15/16/17/19/21/22 adapted to the driver's slim
star schema (FIXTURES.md). Together with tpch.py (Q3/5/6/10/14/18) and
``agg_group`` (Q1) this covers every TPC-H query expressible without the
``partsupp`` table or the comment/phone/shipmode/receiptdate columns; the
remaining ones (Q2, Q11, Q12, Q20) are intrinsically partsupp/shipmode
queries, approximated here where a faithful analog exists (Q16's
supplier-per-part distribution uses lineitem as the part-supplier
relation).

Exactness discipline (numeric.py): every money/quantity aggregate runs in
integer cents, correlated-average predicates (Q17, Q22) are rewritten as
integer cross-multiplications (``qty*5*cnt < sum``) so both engines compare
exact int64s, and ratio outputs perform the identical double op on
identical integer operands.

Scale shapes: Q4/Q21's EXISTS / NOT EXISTS become semi/anti joins that
shuffle on ``l_orderkey`` — the same key as their driving join, so AQE can
reuse one exchange; Q13's left join shuffles on custkey then re-aggregates
a tiny (count, custdist) table; Q15's max-revenue subquery is a broadcast
of a 1-row aggregate, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aind_data_transformation_spark.io.sources import load_table
from aind_data_transformation_spark.ops import attach_broadcast
from aind_data_transformation_spark.queries.numeric import cents, sql_cents
from aind_data_transformation_spark.queries.tpch import _rev, _sql_rev


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking (adapted: the reference receipt/commit
    columns don't exist, so "late" = a line shipped >60 days after the
    order date). EXISTS -> left-semi join on the order key."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    return (
        o.where(
            (F.col("o_orderdate") >= _ts("1996-07-01"))
            & (F.col("o_orderdate") < _ts("1996-10-01"))
        )
        .join(li, (F.col("o_orderkey") == F.col("l_orderkey")) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations, both directions, by ship
    year. Nation is broadcast twice under different aliases (supplier side
    and customer side)."""
    n1, n2 = "NATION_1", "NATION_2"
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.where(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("cn_key"))
        .where(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg((F.sum(_rev()).cast("double") / F.lit(1.0e4)).alias("revenue"))
    )


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: NATION_3 suppliers' share of ECONOMY-part
    revenue sold to ASIA customers, per order year. The share is a ratio
    of two integer-cents sums -> bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    ns = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev()
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p.where(F.col("p_type") == "ECONOMY")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(nation_rev).cast("double") / F.sum(rev).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit (adapted: no partsupp.ps_supplycost — cost
    proxy is p_retailprice * l_quantity), by supplier nation and order
    year, for parts whose name contains 'red'. Profit stays in the same
    1e4 integer-cents scale on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")
    profit = _rev() - cents("p_retailprice") * cents("l_quantity")
    return (
        li.join(
            F.broadcast(p.where(F.col("p_name").contains("red"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum(profit).cast("double") / F.lit(1.0e4)).alias("sum_profit"))
    )


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: left join (keeping
    zero-order customers) -> per-customer count -> distribution. Two
    aggregations, the second over a tiny table."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: quarterly revenue per supplier, keep those equal
    to the max. The max is a 1-row aggregate broadcast back — the equality
    is on exact integer cents, so ties are handled identically to SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev()).alias("rev_c"))
    )
    best = rev.agg(F.max("rev_c").alias("best_c"))
    return (
        rev.join(F.broadcast(best), F.col("rev_c") == F.col("best_c"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_c").cast("double") / F.lit(1.0e4)).alias("total_revenue"),
        )
    )


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier-count by part attributes (adapted: lineitem is the
    part<->supplier relation in this schema). NOT IN (negative-balance
    suppliers) -> left-anti join; the distinct count shuffles once on the
    group keys."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(
                p.where(
                    (F.col("p_brand") != "Brand#5")
                    & (F.col("p_type") != "PROMO")
                    & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: lines under 20% of their part's
    average quantity. The correlated average is a per-part aggregate joined
    back; the 0.2*avg comparison is cross-multiplied into pure int64
    (``cents(qty) * 5 * cnt < sum_cents``) so no float rounding can
    diverge between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(cents("l_quantity")).alias("qty_sum_c"),
        F.count(F.lit(1)).alias("qty_cnt"),
    )
    return (
        li.join(
            F.broadcast(p.where(F.col("p_brand").isin("Brand#1", "Brand#2"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(per_part, F.col("l_partkey") == F.col("pp_key"))
        .where(cents("l_quantity") * F.lit(5) * F.col("qty_cnt") < F.col("qty_sum_c"))
        .agg(
            (
                F.sum(cents("l_extendedprice")).cast("double") / F.lit(100.0) / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue over OR'd (brand, size-band, quantity-band)
    predicate triples — one broadcast join, the disjunction evaluated in a
    single codegen stage."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, sz, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((b == "Brand#11") & sz.between(1, 15) & q.between(1, 15))
        | ((b == "Brand#12") & sz.between(1, 25) & q.between(10, 25))
        | ((b == "Brand#13") & sz.between(1, 35) & q.between(20, 40))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            (F.sum(_rev()).cast("double") / F.lit(1.0e4)).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting (adapted: "late" = shipped
    >90 days after order date, no receipt/commit columns): on finished
    multi-supplier orders, the supplier whose line was late while no other
    supplier's was. EXISTS / NOT EXISTS -> semi/anti joins, all keyed on
    ``l_orderkey`` so the three legs share one shuffle key."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    l1 = (
        li.join(
            o.where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(late)
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("ship3"),
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("k3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("ship3") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_anti",
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 global sales opportunity (adapted: nation key stands in for the
    phone country code): rich-but-inactive customers per nation. The
    "above average positive balance" predicate is cross-multiplied to
    int64 (``cents(bal) * cnt > sum_cents``); inactivity ("no order since
    1999") is a left-anti join against the date-filtered orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    keys = [1, 2, 3, 4, 5, 6, 7]
    pool = c.where(F.col("c_nationkey").isin(keys))
    avg_ = pool.where(F.col("c_acctbal") > 0).agg(
        F.sum(cents("c_acctbal")).alias("bal_sum_c"),
        F.count(F.lit(1)).alias("bal_cnt"),
    )
    recent = o.where(F.col("o_orderdate") >= _ts("1999-01-01"))
    return (
        attach_broadcast(pool, avg_)
        .where(cents("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum_c"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(cents("c_acctbal")).cast("double") / F.lit(100.0)).alias(
                "totacctbal"
            ),
        )
    )


QUERIES = {
    "tpch_q4": q_tpch_q4,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q13": q_tpch_q13,
    "tpch_q15": q_tpch_q15,
    "tpch_q16": q_tpch_q16,
    "tpch_q17": q_tpch_q17,
    "tpch_q19": q_tpch_q19,
    "tpch_q21": q_tpch_q21,
    "tpch_q22": q_tpch_q22,
}

ORACLES = {
    "tpch_q4": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o_orderpriority
    """,
    "tpch_q7": f"""
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               CAST(SUM({_sql_rev()}) AS DOUBLE) / 1e4 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
            OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "tpch_q8": f"""
        SELECT year(o_orderdate) AS o_year,
               CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN {_sql_rev()} ELSE 0 END) AS DOUBLE)
                   / CAST(SUM({_sql_rev()}) AS DOUBLE) AS mkt_share,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region   ON nc.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
        GROUP BY o_year
    """,
    "tpch_q9": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               CAST(SUM({_sql_rev()}
                        - {sql_cents('p_retailprice')} * {sql_cents('l_quantity')})
                    AS DOUBLE) / 1e4 AS sum_profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
    """,
    "tpch_q13": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "tpch_q15": f"""
        WITH revenue AS (
            SELECT l_suppkey, SUM({_sql_rev()}) AS rev_c
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE) / 1e4 AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev_c = (SELECT MAX(rev_c) FROM revenue)
    """,
    "tpch_q16": """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
    """,
    "tpch_q17": f"""
        WITH per_part AS (
            SELECT l_partkey AS pp_key,
                   SUM({sql_cents('l_quantity')}) AS qty_sum_c,
                   COUNT(*) AS qty_cnt
            FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(SUM({sql_cents('l_extendedprice')}) AS DOUBLE) / 100.0 / 7.0
                   AS avg_yearly,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN per_part ON l_partkey = pp_key
        WHERE p_brand IN ('Brand#1', 'Brand#2')
          AND {sql_cents('l_quantity')} * 5 * qty_cnt < qty_sum_c
    """,
    "tpch_q19": f"""
        SELECT CAST(SUM({_sql_rev()}) AS DOUBLE) / 1e4 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 40)
    """,
    "tpch_q21": """
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders   ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 10
    """,
    "tpch_q22": f"""
        WITH pool AS (
            SELECT * FROM customer WHERE c_nationkey IN (1,2,3,4,5,6,7)
        ), avg_ AS (
            SELECT SUM({sql_cents('c_acctbal')}) AS bal_sum_c, COUNT(*) AS bal_cnt
            FROM pool WHERE c_acctbal > 0
        )
        SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
               CAST(SUM({sql_cents('c_acctbal')}) AS DOUBLE) / 100.0 AS totacctbal
        FROM pool, avg_
        WHERE {sql_cents('c_acctbal')} * bal_cnt > bal_sum_c
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
          )
        GROUP BY cntrycode
    """,
}
