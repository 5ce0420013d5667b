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
    "vector_ops",
    "extras",
    "modern_sql",
    "graph",
    "incremental",
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
    return queries, oracles
