"""Embedding-column transformations beyond similarity search: scalar int8
quantization (the storage/serving compression step for vector indexes) and
per-vector L2 norm statistics (embedding-quality screening). Both run as
array-local higher-order functions — zero shuffle, fully pushed-down scans,
whole-stage codegen; at 100 TB they are pure map passes limited by scan
bandwidth.

Exactness: all element math casts float32 -> float64 first (exact), then
applies the SAME sequence of double operations in Spark and DuckDB;
``floor`` and min/max are exact, so results hash-match bit-for-bit with no
rounding slop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aind_data_transformation_spark.io.sources import load_table


def q_vector_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector min-max int8 quantization: each element maps to
    floor((x - vmin) / scale) - 128 with scale = (vmax - vmin)/256, clamped
    to [-128, 127] (the x == vmax edge case). Returns the quantized codes
    plus (vmin, scale) so the caller can dequantize. Constant vectors
    (scale 0) quantize to all -128."""
    e = load_table(spark, sf_dir, "embeddings")
    vmin = "CAST(array_min(embedding) AS DOUBLE)"
    vmax = "CAST(array_max(embedding) AS DOUBLE)"
    scale = f"(({vmax}) - ({vmin})) / 256.0D"
    codes = (
        f"transform(embedding, x -> CAST(least(127L, "
        f"CAST(floor((CAST(x AS DOUBLE) - ({vmin})) / ({scale})) AS BIGINT)"
        f" - 128L) AS BIGINT))"
    )
    return e.select(
        "vec_id",
        F.expr(vmin).alias("vmin"),
        F.expr(scale).alias("scale"),
        F.when(F.expr(scale) == 0.0, F.expr("transform(embedding, x -> -128L)"))
        .otherwise(F.expr(codes))
        .alias("codes"),
    )


def q_embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector dimensionality and L2 norm (sequential left-to-right
    fold over the array in both engines -> identical double rounding), with
    a flag for near-zero-norm vectors (the degenerate embeddings a pipeline
    drops before indexing)."""
    e = load_table(spark, sf_dir, "embeddings")
    ssq = (
        "aggregate(embedding, CAST(0.0 AS DOUBLE),"
        " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.sqrt(F.expr(ssq)).alias("l2_norm"),
        (F.sqrt(F.expr(ssq)) < 1e-6).alias("is_degenerate"),
    )


QUERIES = {
    "vector_quantize": q_vector_quantize,
    "embed_norm_stats": q_embed_norm_stats,
}

_VMIN = "CAST(list_min(embedding) AS DOUBLE)"
_VMAX = "CAST(list_max(embedding) AS DOUBLE)"
_SCALE = f"(({_VMAX}) - ({_VMIN})) / 256.0"

ORACLES = {
    "vector_quantize": f"""
        SELECT vec_id,
               {_VMIN} AS vmin,
               {_SCALE} AS scale,
               CASE WHEN {_SCALE} = 0.0
                    THEN list_transform(embedding, x -> CAST(-128 AS BIGINT))
                    ELSE list_transform(embedding, x -> CAST(
                        least(127, CAST(floor(
                            (CAST(x AS DOUBLE) - ({_VMIN})) / ({_SCALE})
                        ) AS BIGINT) - 128) AS BIGINT))
               END AS codes
        FROM embeddings
    """,
    "embed_norm_stats": """
        WITH t AS (
            SELECT vec_id,
                   CAST(len(embedding) AS BIGINT) AS dim,
                   sqrt(list_aggregate(
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                       'sum')) AS l2_norm
            FROM embeddings
        )
        SELECT vec_id, dim, l2_norm, (l2_norm < 1e-6) AS is_degenerate
        FROM t
    """,
}
