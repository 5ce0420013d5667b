"""Nested-type operators: arrays, maps, JSON (SURVEY.md §2 Part B
"Scalar functions" fn_array/fn_map/fn_json).

Everything is built-in higher-order functions — JVM-side lambdas
(ArrayTransform etc.), no Python. Float arrays are promoted to double
*before* arithmetic on both engines so accumulation is identical; sums over
a 64-element list fold sequentially in list order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aind_data_transformation_spark.io.sources import load_table


def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/slice/sort/higher-order transform+filter+aggregate, then
    posexplode of the first 4 dims (one output row per vec_id x pos)."""
    em = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    stats = em.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("n_dims"),
        F.element_at(dbl, 1).alias("e0"),
        F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x).alias("sum_all"),
        F.size(F.filter(dbl, lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.element_at(F.sort_array(dbl), 1).alias("min_elem"),
        F.element_at(F.sort_array(dbl, asc=False), 1).alias("max_elem"),
        F.element_at(F.transform(dbl, lambda x: x * 2.0), 1).alias("doubled0"),
        F.slice(dbl, 1, 4).alias("head4"),
    )
    return stats.select(
        "vec_id",
        "n_dims",
        "e0",
        "sum_all",
        "n_pos",
        "min_elem",
        "max_elem",
        "doubled0",
        F.posexplode("head4").alias("pos", "val"),
    ).withColumn("pos", F.col("pos").cast("bigint"))


def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + map_keys/map_values/element_at/cardinality."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("k"), F.get_json_object("props", "$.k").cast("long"),
        F.lit("uid"), F.col("user_id"),
    )
    return e.select(
        "event_id",
        m.alias("m"),
    ).select(
        "event_id",
        F.element_at("m", "k").alias("k_val"),
        F.element_at("m", "uid").alias("uid_val"),
        F.size("m").cast("bigint").alias("n_keys"),
        F.array_join(F.map_keys("m"), ",").alias("keys_csv"),
        F.array_join(F.transform(F.map_values("m"), lambda v: v.cast("string")), ",").alias(
            "vals_csv"
        ),
    )


def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction, schema-full from_json, and to_json round-trip
    over the events.props JSON column."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k LONG")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_long"),
        F.to_json(F.struct(F.col("user_id"), parsed.getField("k").alias("k"))).alias(
            "round_trip"
        ),
    )


def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, struct-typed aggregation, and field access:
    pack (acctbal cents, name) into a struct per customer, take the
    per-nation MIN of the struct (Spark orders structs lexicographically —
    the classic argmin-without-a-join trick), then unpack the fields.
    One partial-aggregating shuffle; no window, no self-join."""
    c = load_table(spark, sf_dir, "customer")
    packed = c.select(
        "c_nationkey",
        F.struct(
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
            F.col("c_name").alias("name"),
        ).alias("s"),
    )
    return (
        packed.groupBy("c_nationkey")
        .agg(F.min("s").alias("m"))
        .select(
            "c_nationkey",
            F.col("m.bal_cents").alias("min_bal_cents"),
            F.col("m.name").alias("min_bal_name"),
        )
    )


def q_fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra + construction: sequence, union/intersect/except,
    slice, reverse, position, max/min, flatten. Set results are sorted on
    both sides (Spark preserves first-arg order, DuckDB's list setops
    don't guarantee any) so the comparison is order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    a = F.sequence(F.lit(1), F.col("l_linenumber").cast("int"))
    b = F.sequence(F.lit(3), F.lit(8))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sort_array(F.array_union(a, b)).alias("u"),
        F.sort_array(F.array_intersect(a, b)).alias("i"),
        F.sort_array(F.array_except(b, a)).alias("x"),
        F.slice(b, 2, 3).alias("sl"),
        F.reverse(a).alias("rev"),
        F.array_position(b, 5).cast("bigint").alias("pos5"),
        F.array_max(a).cast("bigint").alias("amax"),
        F.array_min(b).cast("bigint").alias("bmin"),
        F.flatten(F.array(a, b)).alias("flat"),
    )


def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VariantType path (Spark 4): ``parse_json`` to an
    open variant column, typed extraction with ``variant_get``, shredded
    schema discovery with ``schema_of_variant``. The scale story vs
    from_json-with-StructType: no fixed schema needed at write time, and
    the binary variant encoding keeps extraction JVM-side."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k_long"),
        (F.variant_get(v, "$.k", "long") % 10).alias("k_mod10"),
        F.schema_of_variant(v).alias("v_schema"),
        F.variant_get(v, "$.missing", "string").alias("missing_field"),
    )


def q_fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function surface over per-order quantity arrays:
    transform (scale), filter (predicate), exists / forall (quantified
    predicates), aggregate-with-finish (mean as sum DIV count), and
    zip_with against a sequence. The array is a sorted ``collect_list``
    (deterministic element order), all element math is integer-exact.

    Scale: one hash aggregation to build the per-order arrays (basket-
    bounded), then a pure map pass — lambdas run inside codegen, never
    in Python."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("q")
    )
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("q")).alias("qs")
    )
    return arr.select(
        "l_orderkey",
        F.expr("transform(qs, x -> x * 2L)").alias("doubled"),
        F.expr("filter(qs, x -> x >= 25L)").alias("big"),
        F.expr("exists(qs, x -> x >= 49L)").alias("any_huge"),
        F.expr("forall(qs, x -> x >= 5L)").alias("all_mid"),
        F.expr(
            "aggregate(qs, named_struct('s', 0L, 'c', 0L),"
            " (acc, x) -> named_struct('s', acc.s + x, 'c', acc.c + 1L),"
            " acc -> acc.s DIV acc.c)"
        ).alias("mean_floor"),
        F.expr(
            "zip_with(qs, sequence(1L, size(qs)), (x, i) -> x * i)"
        ).alias("weighted"),
    )


def q_fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_values, transform_keys,
    map_filter, and map_zip_with over a per-event map. Each derived map
    is canonicalized to a sorted 'k=v' CSV string (map iteration order
    is engine-internal; the sorted-entries string is the portable
    representation), so the oracle compares exact strings.

    Scale: pure map-side expression work on each row — no shuffle, no
    Python, stays in codegen like the array HOFs."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        F.expr(
            "map('uid', user_id, 'val',"
            " CAST(round(value * 100) AS BIGINT))"
        ).alias("m"),
        F.expr("map('uid', 10L, 'bonus', 5L)").alias("m2"),
    )
    canon = (
        lambda m: f"array_join(transform(array_sort(map_entries({m})),"
        f" e -> concat(e.key, '=', CAST(e.value AS STRING))), ',')"
    )
    return base.select(
        "event_id",
        F.expr(canon("transform_values(m, (k, v) -> v * 2L)")).alias(
            "doubled"
        ),
        F.expr(canon("transform_keys(m, (k, v) -> upper(k))")).alias(
            "upper_keys"
        ),
        F.expr(canon("map_filter(m, (k, v) -> v % 2 = 0)")).alias(
            "even_only"
        ),
        F.expr(
            canon(
                "map_zip_with(m, m2,"
                " (k, v1, v2) -> coalesce(v1, 0L) + coalesce(v2, 0L))"
            )
        ).alias("zipped"),
    )


QUERIES = {
    "fn_higher_order": q_fn_higher_order,
    "fn_map_higher_order": q_fn_map_higher_order,
    "fn_variant": q_fn_variant,
    "fn_array": q_fn_array,
    "fn_map": q_fn_map,
    "fn_json": q_fn_json,
    "fn_struct": q_fn_struct,
    "fn_array_setops": q_fn_array_setops,
}

ORACLES = {
    "fn_map_higher_order": """
        WITH e AS (
            SELECT event_id, user_id,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        )
        SELECT event_id,
               array_to_string(list_transform(list_sort(
                   [{'key': 'uid', 'value': user_id * 2},
                    {'key': 'val', 'value': cents * 2}]),
                   x -> x.key || '=' || CAST(x.value AS VARCHAR)), ',')
                   AS doubled,
               array_to_string(list_transform(list_sort(
                   [{'key': 'UID', 'value': user_id},
                    {'key': 'VAL', 'value': cents}]),
                   x -> x.key || '=' || CAST(x.value AS VARCHAR)), ',')
                   AS upper_keys,
               coalesce(array_to_string(list_transform(list_sort(list_filter(
                   [{'key': 'uid', 'value': user_id},
                    {'key': 'val', 'value': cents}],
                   x -> x.value % 2 = 0)),
                   x -> x.key || '=' || CAST(x.value AS VARCHAR)), ','), '')
                   AS even_only,
               array_to_string(list_transform(list_sort(
                   [{'key': 'bonus', 'value': CAST(5 AS BIGINT)},
                    {'key': 'uid', 'value': user_id + 10},
                    {'key': 'val', 'value': cents}]),
                   x -> x.key || '=' || CAST(x.value AS VARCHAR)), ',')
                   AS zipped
        FROM e
    """,
    "fn_higher_order": """
        WITH arr AS (
            SELECT l_orderkey,
                   list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               list_transform(qs, x -> x * 2) AS doubled,
               list_filter(qs, x -> x >= 25) AS big,
               len(list_filter(qs, x -> x >= 49)) > 0 AS any_huge,
               len(list_filter(qs, x -> NOT (x >= 5))) = 0 AS all_mid,
               CAST(list_aggregate(qs, 'sum') // len(qs) AS BIGINT)
                   AS mean_floor,
               list_transform(range(1, len(qs) + 1),
                              i -> qs[i] * i) AS weighted
        FROM arr
    """,
    "fn_struct": """
        SELECT c_nationkey, bal_cents AS min_bal_cents, name AS min_bal_name
        FROM (
            SELECT c_nationkey,
                   CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents,
                   c_name AS name,
                   ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY CAST(round(c_acctbal*100) AS BIGINT), c_name
                   ) AS rn
            FROM customer
        ) WHERE rn = 1
    """,
    "fn_array": """
        WITH dbl AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
            FROM embeddings
        ), stats AS (
            SELECT vec_id,
                   CAST(len(emb) AS BIGINT) AS n_dims,
                   emb[1] AS e0,
                   list_aggregate(emb, 'sum') AS sum_all,
                   CAST(len(list_filter(emb, x -> x > 0)) AS BIGINT) AS n_pos,
                   list_sort(emb)[1] AS min_elem,
                   list_sort(emb, 'DESC')[1] AS max_elem,
                   list_transform(emb, x -> x * 2.0)[1] AS doubled0,
                   emb[1:4] AS head4
            FROM dbl
        )
        SELECT vec_id, n_dims, e0, sum_all, n_pos, min_elem, max_elem, doubled0,
               CAST(generate_subscripts(head4, 1) - 1 AS BIGINT) AS pos,
               unnest(head4) AS val
        FROM stats
    """,
    "fn_map": """
        WITH m AS (
            SELECT event_id,
                   MAP(['k', 'uid'],
                       [CAST(json_extract_string(props, '$.k') AS BIGINT), user_id]) AS m
            FROM events
        )
        SELECT event_id,
               map_extract(m, 'k')[1] AS k_val,
               map_extract(m, 'uid')[1] AS uid_val,
               CAST(cardinality(m) AS BIGINT) AS n_keys,
               array_to_string(map_keys(m), ',') AS keys_csv,
               array_to_string(list_transform(map_values(m), v -> CAST(v AS VARCHAR)), ',') AS vals_csv
        FROM m
    """,
    "fn_json": """
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
               to_json(struct_pack(
                   user_id := user_id,
                   k := CAST(json_extract_string(props, '$.k') AS BIGINT))) AS round_trip
        FROM events
    """,
    "fn_variant": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
               CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10,
               'OBJECT<k: BIGINT>' AS v_schema,
               CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_field
        FROM events
    """,
    "fn_array_setops": """
        WITH base AS (
            SELECT l_orderkey, l_linenumber,
                   range(1, l_linenumber + 1) AS a,
                   range(3, 9) AS b
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber,
               list_sort(list_distinct(list_concat(a, b))) AS u,
               list_sort(list_intersect(a, b)) AS i,
               list_sort(list_filter(b, x -> NOT list_contains(a, x))) AS x,
               list_slice(b, 2, 4) AS sl,
               list_reverse(a) AS rev,
               CAST(list_position(b, 5) AS BIGINT) AS pos5,
               CAST(list_max(a) AS BIGINT) AS amax,
               CAST(list_min(b) AS BIGINT) AS bmin,
               flatten([a, b]) AS flat
        FROM base
    """,
}
