"""Scalar function library coverage (SURVEY.md §2 Part B "Scalar
functions"): string / date / math / decimal-cast families.

All of these are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen, never Python. Row-level expressions are emitted raw
(bit-identical across engines for identical IEEE ops); the only functions
that are *not* correctly-rounded per IEEE (ln, exp) are rounded to 9
decimals on both sides before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aind_data_transformation_spark.io.sources import load_table


def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.concat_ws("-", "c_name", "c_mktsegment").alias("name_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).alias("name_num"),
        F.expr("replace(c_name, 'Customer', 'Cust')").alias("name_replaced"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).cast("bigint").alias(
            "lev_building"
        ),
        F.size(F.split("c_name", "#")).cast("bigint").alias("n_split_parts"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "seg_trimmed"
        ),
    )


def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("order_year"),
        F.month(d).cast("bigint").alias("order_month"),
        F.dayofmonth(d).cast("bigint").alias("order_day"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(d, F.lit("1995-01-01")).cast("bigint").alias("days_since_epoch95"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        d.cast("timestamp").cast("long").alias("epoch_s"),
    )


def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price, qty = F.col("l_extendedprice"), F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (price / qty).alias("unit_price"),
        # round() is only cross-engine-exact on binary-exact inputs: qty/4
        # lands on 0.25 steps; arbitrary doubles near .x5 round differently
        # (Spark rounds the binary value, DuckDB the decimal rendering).
        F.round(qty / F.lit(4.0), 1).alias("qty_quarter_r1"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(qty - F.lit(25.0)).alias("qty_dev"),
        F.pow(F.lit(2.0), F.col("l_linenumber")).alias("pow2_line"),
        F.sqrt(price).alias("price_sqrt"),
        F.round(F.log(price), 9).alias("price_ln_r9"),
        F.round(F.exp("l_discount"), 9).alias("disc_exp_r9"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.expr("l_orderkey DIV 7").alias("key_div7"),
    )


def q_fn_cast_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money math at DECIMAL(12,2): exact per-group sums, decimal->string
    round-trip, final cast to double for cross-engine hashing."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(12,2)")
    return o.groupBy("o_custkey").agg(
        F.sum(dec).cast("double").alias("total_spend"),
        F.max(dec).cast("double").alias("max_order"),
        F.min(dec).cast("string").alias("min_order_str"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional scalar family: coalesce / nullif / ifnull / greatest /
    least / if — all codegen'd null-safe branches, no shuffle."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(1000.0)).alias("bal_cap1000"),
        F.nullif(F.round(bal).cast("bigint") % 10, F.lit(0)).alias("lastdig_or_null"),
        F.expr("ifnull(nullif(c_mktsegment, 'MACHINERY'), '<none>')").alias(
            "seg_not_machinery"
        ),
        F.when(bal > 5000.0, F.lit("rich")).otherwise(F.lit("normal")).alias("tier"),
    )


def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family over the integer keys: and/or/xor, shifts,
    popcount."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_orderkey & l_partkey").alias("k_and"),
        F.expr("l_orderkey | l_partkey").alias("k_or"),
        F.expr("l_orderkey ^ l_partkey").alias("k_xor"),
        F.shiftleft(F.col("l_linenumber"), 2).cast("bigint").alias("line_shl2"),
        F.shiftright(F.col("l_orderkey"), 1).cast("bigint").alias("key_shr1"),
        F.bit_count("l_orderkey").cast("bigint").alias("key_popcount"),
    )


def q_fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family on document text: match, count-all, extract, global
    replace."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        t.rlike("[0-9]").alias("has_digit"),
        F.size(F.regexp_extract_all(t, F.lit("[aeiou]{2}"), 0))
        .cast("bigint")
        .alias("n_double_vowels"),
        F.regexp_extract(t, r"^(\S+)", 1).alias("first_word"),
        F.length(F.regexp_replace(t, r"[aeiou]", "")).cast("bigint").alias(
            "len_no_vowels"
        ),
    )


QUERIES = {
    "fn_string": q_fn_string,
    "fn_date": q_fn_date,
    "fn_math": q_fn_math,
    "fn_cast_decimal": q_fn_cast_decimal,
    "fn_conditional": q_fn_conditional,
    "fn_bitwise": q_fn_bitwise,
    "fn_regexp": q_fn_regexp,
}

ORACLES = {
    "fn_string": r"""
        SELECT c_custkey,
               upper(c_mktsegment) AS seg_upper,
               lower(c_name) AS name_lower,
               substr(c_name, 10, 9) AS name_digits,
               concat_ws('-', c_name, c_mktsegment) AS name_seg,
               lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
               regexp_extract(c_name, 'Customer#(\d+)', 1) AS name_num,
               replace(c_name, 'Customer', 'Cust') AS name_replaced,
               CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_building,
               CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_split_parts,
               CAST(length(c_name) AS BIGINT) AS name_len,
               trim('  ' || c_mktsegment || ' ') AS seg_trimmed
        FROM customer
    """,
    "fn_date": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS order_year,
               CAST(month(o_orderdate) AS BIGINT) AS order_month,
               CAST(day(o_orderdate) AS BIGINT) AS order_day,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
               CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
                   AS days_since_epoch95,
               strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
               CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        FROM orders
    """,
    "fn_math": """
        SELECT l_orderkey,
               l_linenumber,
               l_extendedprice / l_quantity AS unit_price,
               round(l_quantity / 4.0, 1) AS qty_quarter_r1,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               abs(l_quantity - 25.0) AS qty_dev,
               pow(2.0, l_linenumber) AS pow2_line,
               sqrt(l_extendedprice) AS price_sqrt,
               round(ln(l_extendedprice), 9) AS price_ln_r9,
               round(exp(l_discount), 9) AS disc_exp_r9,
               l_orderkey % 7 AS key_mod7,
               l_orderkey // 7 AS key_div7
        FROM lineitem
    """,
    "fn_cast_decimal": """
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spend,
               CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_order,
               CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS min_order_str,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
    """,
    "fn_conditional": """
        SELECT c_custkey,
               coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
               greatest(c_acctbal, 0.0) AS bal_floor0,
               least(c_acctbal, 1000.0) AS bal_cap1000,
               nullif(CAST(round(c_acctbal) AS BIGINT) % 10, 0) AS lastdig_or_null,
               ifnull(nullif(c_mktsegment, 'MACHINERY'), '<none>') AS seg_not_machinery,
               CASE WHEN c_acctbal > 5000.0 THEN 'rich' ELSE 'normal' END AS tier
        FROM customer
    """,
    "fn_bitwise": """
        SELECT l_orderkey,
               l_linenumber,
               l_orderkey & l_partkey AS k_and,
               l_orderkey | l_partkey AS k_or,
               xor(l_orderkey, l_partkey) AS k_xor,
               CAST(l_linenumber << 2 AS BIGINT) AS line_shl2,
               CAST(l_orderkey >> 1 AS BIGINT) AS key_shr1,
               CAST(bit_count(l_orderkey) AS BIGINT) AS key_popcount
        FROM lineitem
    """,
    "fn_regexp": r"""
        SELECT doc_id,
               regexp_matches(text, '[0-9]') AS has_digit,
               CAST(len(regexp_extract_all(text, '[aeiou]{2}')) AS BIGINT)
                   AS n_double_vowels,
               regexp_extract(text, '^(\S+)', 1) AS first_word,
               CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT)
                   AS len_no_vowels
        FROM documents
    """,
}
