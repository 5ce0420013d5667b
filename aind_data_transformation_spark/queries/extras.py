"""Surface-completion operators: URL parsing, trigonometry, locale-free
number/string formatting, timezone conversion, window value functions
(first/last/nth), and ordered string aggregation. Individually small, these
round out the scalar/window/aggregate function families of SURVEY.md §2 so
a user of the reference-style ETL jobs finds every everyday SQL function
available.

Dialect care (each noted on the query): ``parse_url`` vs regexp extraction,
JVM vs libm trig (results rounded to 6 dp — identical inputs differ at most
in the last ulp, ~1e-17 relative, so a 1e-6 rounding boundary hit is
~1e-11 probable per value), and DuckDB ``string_agg ... ORDER BY`` vs
Spark ``array_join(array_sort(collect_list))`` (same deterministic result,
different spellings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aind_data_transformation_spark.io.sources import load_table


def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL construction + decomposition: build a canonical URL per document
    then take it apart with ``parse_url`` (host / path / one query
    parameter). Pure projection — scan-bandwidth bound at any scale. The
    oracle decomposes with regexps since DuckDB has no parse_url."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


def q_fn_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / transcendental family over l_discount (sin, cos,
    tan, atan2, degrees). Rounded to 6 dp on both engines — JVM Math and
    libm agree to well past 6 significant decimals."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(x), 6).alias("sin_x"),
        F.round(F.cos(x), 6).alias("cos_x"),
        F.round(F.tan(x), 6).alias("tan_x"),
        F.round(F.atan2(x, F.lit(1.0)), 6).alias("atan2_x1"),
        F.round(F.degrees(x), 6).alias("deg_x"),
    )


def q_fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string formatting: printf-style composition and
    fixed-width zero padding — the formatting layer of report/export jobs.
    ``format_string`` maps to DuckDB ``printf`` with identical %-specs."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string(
            "order-%07d [%s]", F.col("o_orderkey"), F.col("o_orderstatus")
        ).alias("order_tag"),
        F.format_string("%.2f", F.col("o_totalprice")).alias("price_str"),
        F.lpad(F.col("o_orderpriority"), 12, "*").alias("priority_padded"),
    )


def q_fn_datetime_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone conversion of the (UTC) event stream to America/New_York
    wall-clock: converted timestamp, local hour, and local day — the
    localization step of every reporting rollup. Spark
    ``from_utc_timestamp`` == DuckDB naive-UTC ``timezone(tz, ts)``."""
    e = load_table(spark, sf_dir, "events")
    local = F.from_utc_timestamp("ts", "America/New_York")
    return e.select(
        "event_id",
        local.alias("ts_ny"),
        F.hour(local).cast("long").alias("hour_ny"),
        F.date_trunc("day", local).alias("day_ny"),
    )


def q_win_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window value functions over the full partition frame: per customer,
    every order annotated with the most/least expensive and second most
    expensive order keys (first_value / last_value / nth_value with an
    unbounded frame, deterministic (price, key) ordering)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first_value("o_orderkey").over(w).alias("top_order"),
        F.last_value("o_orderkey").over(w).alias("bottom_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: '|'-joined sorted customer names per
    nation — Spark spells DuckDB's ``string_agg(... ORDER BY ...)`` as
    ``array_join(array_sort(collect_list(...)))``; both are deterministic.
    ``collect_list`` per group is safe when group payloads are bounded
    (names per nation); unbounded-payload aggregation belongs in
    ``agg_collect``'s documented limits."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("c_name")), "|"
            ).alias("names"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


def q_fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic surface: month addition with end-of-month
    clamping (``add_months``), day offsets, last-day-of-month, quarter
    truncation, and integer month spans — all pure column expressions in
    whole-stage codegen, mapped to the equivalent DuckDB interval ops in
    the oracle."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    fmt = "yyyy-MM-dd"
    # dates travel as formatted strings (house convention, q_fn_date):
    # pandas/NumPy widen DATE to midnight timestamps, so raw date columns
    # can never hash-match across the engine boundary
    return o.select(
        "o_orderkey",
        F.date_format(d, fmt).alias("order_date"),
        F.date_format(F.add_months(d, 3), fmt).alias("plus_3m"),
        F.date_format(F.date_add(d, 45), fmt).alias("plus_45d"),
        F.date_format(F.last_day(d), fmt).alias("month_end"),
        F.date_format(F.trunc(d, "quarter"), fmt).alias("quarter_start"),
        (
            (F.year(d) - F.lit(1995)) * 12 + (F.month(d) - F.lit(1))
        ).cast("long").alias("months_since_1995"),
    )


QUERIES = {
    "fn_interval_arith": q_fn_interval_arith,
    "fn_url": q_fn_url,
    "fn_trig": q_fn_trig,
    "fn_format": q_fn_format,
    "fn_datetime_tz": q_fn_datetime_tz,
    "win_value_fns": q_win_value_fns,
    "agg_listagg": q_agg_listagg,
}

ORACLES = {
    "fn_interval_arith": """
        SELECT o_orderkey,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
               strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH
                             AS DATE), '%Y-%m-%d') AS plus_3m,
               strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY
                             AS DATE), '%Y-%m-%d') AS plus_45d,
               strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
                   AS month_end,
               strftime(CAST(date_trunc('quarter', CAST(o_orderdate AS DATE))
                             AS DATE), '%Y-%m-%d') AS quarter_start,
               CAST((year(o_orderdate) - 1995) * 12
                    + (month(o_orderdate) - 1) AS BIGINT)
                   AS months_since_1995
        FROM orders
    """,
    "fn_url": """
        WITH t AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/' ||
                       CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
            FROM documents
        )
        SELECT doc_id, url,
               regexp_extract(url, 'https://([^/]+)/', 1) AS host,
               regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
               regexp_extract(url, 'lang=(.*)$', 1) AS lang_param
        FROM t
    """,
    "fn_trig": """
        SELECT l_orderkey, l_linenumber,
               round(sin(l_discount), 6) AS sin_x,
               round(cos(l_discount), 6) AS cos_x,
               round(tan(l_discount), 6) AS tan_x,
               round(atan2(l_discount, 1.0), 6) AS atan2_x1,
               round(degrees(l_discount), 6) AS deg_x
        FROM lineitem
    """,
    "fn_format": """
        SELECT o_orderkey,
               printf('order-%07d [%s]', o_orderkey, o_orderstatus)
                   AS order_tag,
               printf('%.2f', o_totalprice) AS price_str,
               lpad(o_orderpriority, 12, '*') AS priority_padded
        FROM orders
    """,
    "fn_datetime_tz": """
        WITH t AS (
            SELECT event_id,
                   CAST(timezone('America/New_York',
                        ts::TIMESTAMP AT TIME ZONE 'UTC') AS TIMESTAMP)
                       AS ts_ny
            FROM events
        )
        SELECT event_id, ts_ny,
               CAST(hour(ts_ny) AS BIGINT) AS hour_ny,
               CAST(date_trunc('day', ts_ny) AS TIMESTAMP) AS day_ny
        FROM t
    """,
    "win_value_fns": """
        SELECT o_orderkey, o_custkey,
               FIRST_VALUE(o_orderkey) OVER w AS top_order,
               LAST_VALUE(o_orderkey) OVER w AS bottom_order,
               NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (
            PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    """,
    "agg_listagg": """
        SELECT n.n_name,
               string_agg(c.c_name, '|' ORDER BY c.c_name) AS names,
               COUNT(*) AS n_customers
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
}
