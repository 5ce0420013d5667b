"""UDF / UDAF / UDTF surface (SURVEY.md §2 Part B).

UDF policy for 100 TB (and for this engine):
* built-in functions first — every op here exists only to prove the
  extension surface;
* when Python is unavoidable, Arrow-batched pandas UDFs
  (``@pandas_udf`` / ``applyInPandas``), never row-at-a-time ``F.udf``
  in a hot path — the one row-at-a-time UDF below is deliberately the
  simplest possible string op, as the demonstration of the slow tier;
* grouped custom aggregation uses ``applyInPandas`` with an explicit
  output schema and a deterministic in-group sort before any float
  reduction.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from aind_data_transformation_spark.io.sources import load_table

#: deterministic 64-dim query vector for the cosine demo: q_i = 0.125
_QUERY_WEIGHT = 0.125
_DIMS = 64


def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF: whitespace-collapsing text normalizer.
    (Kept trivially simple — this tier exists for API parity; the pandas
    tier below is the one to use in hot paths.)"""
    import re

    ws = re.compile(r"\s+")

    @F.udf("string")
    def normalize(text: str) -> str:
        if text is None:
            return None
        return ws.sub(" ", text.strip().lower())

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(normalize("text"), 1, 40).alias("norm_prefix"),
        F.length(normalize("text")).cast("bigint").alias("norm_len"),
    )


def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized (Arrow) pandas UDF: cosine similarity of each embedding
    against a constant query vector, computed in float64 and rounded to 9
    decimals (np SIMD vs sequential fold differ in the last ulp)."""
    import numpy as np

    @pandas_udf("double")
    def cosine_to_query(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        q = np.full(mat.shape[1], _QUERY_WEIGHT)
        dots = mat @ q
        norms = np.linalg.norm(mat, axis=1) * np.linalg.norm(q)
        return pd.Series(np.round(dots / norms, 9))

    em = load_table(spark, sf_dir, "embeddings")
    return em.select("vec_id", cosine_to_query("embedding").alias("cos_sim_r9"))


def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped custom aggregation via applyInPandas: per-label embedding
    centroid, exploded to (label, dim, centroid). Rows are sorted by
    vec_id inside each group before the float reduction, and the result is
    rounded to 6 decimals, so the value is order-independent."""
    import numpy as np

    em = load_table(spark, sf_dir, "embeddings")

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        mean = np.round(mat.mean(axis=0), 6)
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "dim": np.arange(mat.shape[1], dtype=np.int64),
                "centroid": mean,
            }
        )

    return em.groupBy("label").applyInPandas(
        centroid, "label int, dim long, centroid double"
    )


def q_udaf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped aggregation through ``groupBy().applyInArrow`` (Spark 4):
    the zero-pandas grouped boundary — each group arrives as a
    ``pyarrow.Table``. Computes per-label vector count plus the mean of
    embedding dim 0 (rounded to 6 decimals, accumulation in float64 over
    the group's Arrow buffer)."""
    import pyarrow as pa

    em = load_table(spark, sf_dir, "embeddings")

    def stats(table: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        # sort by vec_id so the float accumulation order is fixed
        table = table.sort_by("vec_id")
        label = table.column("label")[0].as_py()
        emb = table.column("embedding")
        dim0 = pa.array(
            [v[0].as_py() for v in emb], type=pa.float64()
        )
        mean0 = round(pc.mean(dim0).as_py(), 6)
        return pa.Table.from_arrays(
            [
                pa.array([label], type=pa.int32()),
                pa.array([table.num_rows], type=pa.int64()),
                pa.array([mean0], type=pa.float64()),
            ],
            names=["label", "n_vecs", "mean_dim0_r6"],
        )

    return em.groupBy("label").applyInArrow(
        stats, "label int, n_vecs long, mean_dim0_r6 double"
    )


def q_cogroup_asof_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas API (``groupBy().cogroup().applyInPandas``): the
    distributed pandas-merge_asof pattern — purchases and views cogroup
    per user_id, and each group pair runs plain ``pd.merge_asof``
    (backward, 7-day tolerance) inside Arrow batches. Same semantics as
    ``attribution_last_touch`` (which the oracle reuses), but exercised
    through the cogroup boundary — the way a pandas-first team ports an
    existing merge_asof pipeline to the cluster without rewriting it.

    Scale: ONE co-partitioned shuffle of both sides — but on a hashed
    *bucket* of user_id, not user_id itself. Cogrouped applyInPandas
    invokes Python once per group, so grouping on the raw key means one
    pandas call per user (millions at 100 TB, each a few rows — pure
    invocation overhead). Bucketing to a fixed number of groups amortizes
    the Python boundary while ``pd.merge_asof(by="user_id")`` keeps the
    per-user matching exact inside each bucket."""
    n_buckets = 64
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.pmod(F.hash("user_id"), F.lit(n_buckets)).alias("bucket"),
    )
    # the view side renames ts -> vts and user_id -> vuser: both sides
    # descend from the same scan, and a shared attribute between cogrouped
    # relations is deduplicated away (the right frame would silently lose
    # any column it shares with the left once it isn't the grouping key)
    views = (
        e.where(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("vuser"),
            F.col("ts").alias("vts"),
            "event_id",
            (F.get_json_object("props", "$.k").cast("long") % 4).alias(
                "campaign"
            ),
        )
        .groupBy("vuser", "vts")
        .agg(F.max_by("campaign", "event_id").alias("campaign"))
        .withColumn("bucket", F.pmod(F.hash("vuser"), F.lit(n_buckets)))
    )

    def attribute(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {"user_id": [], "cents": [], "campaign": []}
            ).astype({"user_id": "int64", "cents": "int64", "campaign": "object"})
        left = left.sort_values("ts", kind="mergesort")
        if right.empty:
            out = left.assign(campaign=None)
        else:
            out = pd.merge_asof(
                left,
                right.sort_values("vts", kind="mergesort"),
                left_on="ts",
                right_on="vts",
                left_by="user_id",
                right_by="vuser",
                direction="backward",
                tolerance=pd.Timedelta(days=7),
            )
        return out[["user_id", "cents", "campaign"]]

    attributed = (
        purchases.groupBy("bucket")
        .cogroup(views.groupBy("bucket"))
        .applyInPandas(attribute, "user_id long, cents long, campaign long")
    )
    return attributed.groupBy("campaign").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").cast("long").alias("attributed_cents"),
    )


def q_udtf_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row-to-many table function: tokenize documents (whitespace
    split with position). Expressed as posexplode(split(...)) — JVM-side,
    no Python — which is the UDTF fast path."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    ).withColumn("pos", F.col("pos").cast("bigint"))


def q_udtf_python_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-based Python UDTF (Spark 3.5+/4 ``@udtf``): per-document
    token histogram rows — one row per distinct token with its count and
    the doc's token total. Unlike posexplode this runs arbitrary Python
    per input row, the genuine UDTF surface; still partition-parallel
    (each task streams its rows through the UDTF)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="token: string, n: long, doc_total: long")
    class TokenHist:
        def eval(self, doc_id, text: str):
            toks = text.split(" ")
            total = len(toks)
            counts: dict = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for t in sorted(counts):
                yield (t, counts[t], total)

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    spark.udtf.register("token_hist", TokenHist)
    d.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, t.token, t.n, t.doc_total
        FROM _udtf_docs,
             LATERAL token_hist(doc_id, text) AS t
        """
    )


def q_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 ``analyze()`` static method): the
    output schema is computed at plan time from the literal argument —
    here a JSON field name whose value becomes a column NAMED after that
    field. This is the shape connector/extraction UDTFs take when the
    caller decides the projection (`json_field(props, 'k')` -> column
    ``k``). The rowwise extraction feeds a normal aggregation so the
    oracle stays compact."""
    import json as _json

    from pyspark.sql.functions import udtf
    from pyspark.sql import types as T
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class JsonField:
        @staticmethod
        def analyze(
            row: AnalyzeArgument, field: AnalyzeArgument
        ) -> AnalyzeResult:
            return AnalyzeResult(
                schema=T.StructType(
                    [T.StructField(str(field.value), T.LongType())]
                )
            )

        def eval(self, row: str, field: str):
            try:
                v = _json.loads(row).get(field)
            except Exception:
                v = None
            yield (int(v) if v is not None else None,)

    spark.udtf.register("json_field", udtf(JsonField))
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "_poly_events"
    )
    return spark.sql(
        """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(t.k) AS BIGINT) AS sum_k,
               CAST(MIN(t.k) AS BIGINT) AS min_k,
               CAST(MAX(t.k) AS BIGINT) AS max_k
        FROM _poly_events, LATERAL json_field(props, 'k') AS t
        """
    )


def q_udtf_table_arg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-argument Python UDTF (Spark 4 ``TABLE(...) PARTITION BY``):
    the UDTF consumes a whole relation, Spark shuffles it so each UDTF
    instance sees exactly one partition key's rows, and ``terminate()``
    emits the per-group summary — the user-defined-aggregation-over-
    tables surface (the API Spark gives Python for custom per-group
    logic that doesn't fit applyInPandas' one-DataFrame-per-call model).

    Cross-engine exactness: the accumulator is integer cents (addition
    order inside the partition cannot change the sum); ratios close in
    one double division. Scale: PARTITION BY is a hash shuffle; one
    UDTF instance per key — same distribution shape as any groupBy."""
    from pyspark.sql.functions import udtf
    from pyspark.sql import Row

    @udtf(
        returnType=(
            "o_orderstatus string, n_orders bigint, total_cents bigint,"
            " avg_price double"
        )
    )
    class StatusRollup:
        def __init__(self):
            self._key = None
            self._n = 0
            self._cents = 0

        def eval(self, row: Row):
            self._key = row["o_orderstatus"]
            self._n += 1
            # half-away-from-zero to match SQL round() everywhere else —
            # Python's round() is half-to-even and would silently diverge
            # on any price grid where v*100 lands exactly on .5
            v = row["o_totalprice"] * 100
            self._cents += int(math.floor(v + 0.5)) if v >= 0 else -int(
                math.floor(-v + 0.5)
            )

        def terminate(self):
            if self._n:
                yield (
                    self._key,
                    self._n,
                    self._cents,
                    self._cents / self._n / 100.0,
                )

    spark.udtf.register("status_rollup_ta", StatusRollup)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "_ta_orders"
    )
    return spark.sql(
        """
        SELECT * FROM status_rollup_ta(
            TABLE(_ta_orders) PARTITION BY o_orderstatus
        )
        """
    )


def q_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized scalar Python UDF (Spark 4 ``useArrow=True``): the
    third UDF tier — row-signature ergonomics with Arrow batch transfer.
    Same normalizer contract as ``udf_python`` so the two tiers are
    directly comparable in the bench."""
    import re

    ws = re.compile(r"\s+")

    @F.udf("string", useArrow=True)
    def normalize_arrow(text: str) -> str:
        if text is None:
            return None
        return ws.sub(" ", text.strip().lower())

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(normalize_arrow("text"), 1, 40).alias("norm_prefix"),
        F.length(normalize_arrow("text")).cast("bigint").alias("norm_len"),
    )


_Q_LIT = "[" + ", ".join([str(_QUERY_WEIGHT)] * _DIMS) + "]"

QUERIES = {
    "udtf_table_arg": q_udtf_table_arg,
    "udtf_polymorphic": q_udtf_polymorphic,
    "cogroup_asof_pandas": q_cogroup_asof_pandas,
    "udaf_arrow_grouped": q_udaf_arrow_grouped,
    "udf_arrow": q_udf_arrow,
    "udtf_python_class": q_udtf_python_class,
    "udf_python": q_udf_python,
    "udf_pandas": q_udf_pandas,
    "udaf_grouped": q_udaf_grouped,
    "udtf_flatten": q_udtf_flatten,
}

ORACLES = {
    "udtf_table_arg": """
        SELECT o_orderstatus,
               COUNT(*)::BIGINT AS n_orders,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
                   AS total_cents,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
                    AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    "udtf_python_class": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS token,
                   len(string_split(text, ' ')) AS doc_total
            FROM documents WHERE doc_id < 20
        )
        SELECT doc_id, token, COUNT(*) AS n, MAX(doc_total) AS doc_total
        FROM toks
        GROUP BY doc_id, token
    """,
    "udf_python": r"""
        SELECT doc_id,
               substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 40) AS norm_prefix,
               CAST(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS BIGINT) AS norm_len
        FROM documents
    """,
    "udaf_arrow_grouped": """
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               round(AVG(CAST(embedding[1] AS DOUBLE)), 6) AS mean_dim0_r6
        FROM embeddings GROUP BY label
    """,
    "cogroup_asof_pandas": """
        WITH purchases AS (
            SELECT user_id, ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
        ), views AS (
            SELECT user_id, ts,
                   arg_max(CAST(json_extract(props, '$.k') AS BIGINT) % 4,
                           event_id) AS campaign
            FROM events WHERE event_type = 'view'
            GROUP BY user_id, ts
        ), attributed AS (
            SELECT p.user_id, p.cents,
                   CASE WHEN p.ts - v.ts > INTERVAL 7 DAY THEN NULL
                        ELSE v.campaign END AS campaign
            FROM purchases p
            ASOF LEFT JOIN views v
              ON p.user_id = v.user_id AND p.ts >= v.ts
        )
        SELECT campaign,
               CAST(COUNT(*) AS BIGINT) AS n_purchases,
               CAST(SUM(cents) AS BIGINT) AS attributed_cents
        FROM attributed GROUP BY campaign
    """,
    "udtf_polymorphic": """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS sum_k,
               MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
               MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
        FROM events
    """,
    "udf_arrow": r"""
        SELECT doc_id,
               substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 40) AS norm_prefix,
               CAST(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS BIGINT) AS norm_len
        FROM documents
    """,
    "udf_pandas": f"""
        WITH q AS (SELECT CAST({_Q_LIT} AS DOUBLE[]) AS qv)
        SELECT vec_id,
               round(
                 list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), qv)
                 / (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                          list_transform(embedding, x -> CAST(x AS DOUBLE))))
                    * sqrt(list_dot_product(qv, qv))),
                 9) AS cos_sim_r9
        FROM embeddings, q
    """,
    "udaf_grouped": """
        WITH exploded AS (
            SELECT label,
                   CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS dim,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings
        )
        SELECT CAST(label AS INTEGER) AS label,
               dim,
               round(avg(val), 6) AS centroid
        FROM exploded
        GROUP BY label, dim
    """,
    "udtf_flatten": """
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS BIGINT) AS pos,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    """,
}
