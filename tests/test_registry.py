"""Registry invariants: every operator key promised by SURVEY.md §2 Part B
stays registered (a refactor that silently drops one fails here), every
oracle has a query, and all callables have the driver signature."""

from __future__ import annotations

import inspect

from aind_data_transformation_spark.queries import registry

#: SURVEY.md §2 Part B — the build contract's operator inventory.
SURVEY_KEYS = {
    # sources / sinks
    "scan_parquet", "scan_csv_json", "sink_parquet_partitioned", "sink_repartition",
    # projection / filter / predicates
    "project_filter", "filter_compound", "filter_like_regex", "case_when",
    # joins
    "join_inner_equi", "join_broadcast", "join_left_right_full",
    "join_semi_anti", "join_theta_range", "join_asof", "join_cross", "join_self",
    # aggregations
    "agg_group", "agg_distinct", "agg_approx_distinct", "agg_rollup_cube",
    "agg_having", "agg_collect", "agg_minmax_by", "agg_percentiles",
    # windows
    "win_rank", "win_running", "win_lag_lead", "win_ntile_cume", "topk_per_group",
    # sort / set
    "sort_limit", "sort_multi_null", "set_union", "set_intersect_except",
    # scalar functions
    "fn_string", "fn_date", "fn_math", "fn_array", "fn_map", "fn_json",
    "fn_cast_decimal",
    # UDF tier
    "udf_python", "udf_pandas", "udaf_grouped", "udtf_flatten",
    # LLM-data-pipeline
    "dedup_exact", "dedup_fuzzy_minhash", "sim_search_topk", "text_stats",
    "lang_filter_quality", "multimodal_join",
    # streaming batch twins
    "stream_tumbling", "stream_sliding", "stream_session", "stream_dedup",
    "stream_late_data", "stream_stateful",
}

#: rows-only by design (no ANSI-SQL-expressible exact oracle)
NO_ORACLE_OK = {"agg_approx_distinct", "agg_hll_sketch"}


def test_survey_inventory_fully_registered():
    queries, _ = registry()
    missing = SURVEY_KEYS - set(queries)
    assert not missing, f"SURVEY §2 keys missing from registry: {missing}"


def test_every_oracle_has_a_query_and_most_queries_have_oracles():
    queries, oracles = registry()
    assert set(oracles) <= set(queries)
    without = set(queries) - set(oracles)
    assert without <= NO_ORACLE_OK, (
        f"queries silently lacking an oracle: {without - NO_ORACLE_OK}"
    )


def test_callables_have_driver_signature():
    queries, _ = registry()
    for key, fn in queries.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{key} must take (spark, sf_dir)"


def test_driver_window_is_all_oracle_checkable_part_b():
    """The driver's correctness gate only reads the first N registry keys
    (N=50 in round 1); none of those slots may be wasted on a rows-only
    key, and the SURVEY §2 contract keys must come first."""
    from aind_data_transformation_spark.queries import _PART_B_ORACLE_KEYS

    queries, oracles = registry()
    keys = list(queries)
    window = keys[:50]
    assert all(k in oracles for k in window), (
        "driver window contains a no-oracle key"
    )
    assert all(k in _PART_B_ORACLE_KEYS for k in window)
    no_oracle = [k for k in keys if k not in oracles]
    assert keys[-len(no_oracle):] == no_oracle, (
        "rows-only keys must sort to the end of the registry"
    )


def test_bench_snapshot_covers_registry():
    """The committed bench snapshot may not lag the registry: every
    registered key has a timing entry in bench_full.json and vice versa
    (a missing key means bench.py wasn't re-run after adding an
    operator; a stale key means a rename left a ghost)."""
    import json
    import pathlib

    from aind_data_transformation_spark.queries import registry

    snap = json.loads(
        (pathlib.Path(__file__).parent.parent / "bench_full.json").read_text()
    )
    queries, _ = registry()
    missing = sorted(set(queries) - set(snap["queries"]))
    stale = sorted(set(snap["queries"]) - set(queries))
    assert not missing, f"bench_full.json lags the registry: {missing}"
    assert not stale, f"bench_full.json has ghost keys: {stale}"
