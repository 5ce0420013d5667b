"""Corpus text-mining operators: per-document keyword extraction
(tf-idf-style) and corpus-level n-gram frequency — the term-statistics
passes an LLM-data pipeline runs for vocabulary construction, topic
screening, and boilerplate detection.

Exactness strategy: the classic tf*idf score needs ``ln()``, whose last-ulp
behavior differs between the JVM and DuckDB's libm, which would break the
driver's bit-exact hash compare on rank boundaries. The ranking here is the
equivalent *integer* ordering (tf DESC, df ASC, term ASC): for a fixed
document, tf*ln((N+1)/(df+1)) is monotone in (tf, -df), so the top-k set is
a valid tf-idf keyword set while staying engine-exact. The raw (tf, df)
integers are returned so a caller can compute any idf weighting downstream.

Scale notes: token explode is a flatMap (no shuffle); the (doc, term) tf
aggregation and the term df aggregation are single hash-agg shuffles; df is
term-cardinality (vocabulary) sized, orders of magnitude smaller than the
corpus, so the df join broadcasts at any realistic vocabulary size — at
100 TB you'd cap it with a min-df filter, same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aind_data_transformation_spark.io.sources import load_table

_TOKENS = "split(lower(text), ' ')"


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document ranked by (tf DESC, df ASC, term ASC) —
    the integer-exact tf-idf ordering (module docstring). Returns
    (doc_id, term, tf, df, rank)."""
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(
        "doc_id", F.explode(F.expr(_TOKENS)).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_ = terms.distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    # No forced broadcast of the document-frequency side: at 100 TB the
    # distinct-token table is heavy-tailed and GB-scale, and a mandatory
    # broadcast OOMs the driver. A plain equi-join on term lets AQE
    # broadcast only when the vocab actually fits the threshold.
    return (
        tf.join(df_, "term")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", "rank")
    )


def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams with occurrence counts (ties broken
    by gram text). The bigram construction is a zip of the token array with
    its own tail via ``transform`` — array-local, no shuffle; the count is
    one hash aggregation; the global top-20 is a TakeOrdered (no full
    sort)."""
    d = load_table(spark, sf_dir, "documents")
    # materialize the token array once: referencing the split expression
    # inside transform/element_at/size would re-tokenize per reference
    toks = d.select(F.expr(_TOKENS).alias("toks")).where(F.size("toks") >= 2)
    grams = (
        "transform(sequence(1, size(toks) - 1),"
        " i -> concat_ws(' ', element_at(toks, i),"
        " element_at(toks, i + 1)))"
    )
    return (
        toks.select(F.explode(F.expr(grams)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("gram").asc())
        .limit(20)
    )


QUERIES = {
    "tfidf_keywords": q_tfidf_keywords,
    "ngram_topk": q_ngram_topk,
}

ORACLES = {
    "tfidf_keywords": """
        WITH terms AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
            FROM documents
        ), nonempty AS (
            SELECT doc_id, term FROM terms WHERE term <> ''
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM nonempty GROUP BY doc_id, term
        ), df AS (
            SELECT term, COUNT(*) AS df
            FROM (SELECT DISTINCT doc_id, term FROM nonempty)
            GROUP BY term
        )
        SELECT doc_id, term, tf, df, rank FROM (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, df.df ASC, tf.term ASC
                   ) AS BIGINT) AS rank
            FROM tf JOIN df ON tf.term = df.term
        ) WHERE rank <= 3
    """,
    "ngram_topk": """
        WITH toks AS (
            SELECT string_split(lower(text), ' ') AS t FROM documents
        ), grams AS (
            SELECT unnest(list_transform(
                       range(1, len(t)),
                       i -> t[i] || ' ' || t[i + 1]
                   )) AS gram
            FROM toks WHERE len(t) >= 2
        )
        SELECT gram, COUNT(*) AS n
        FROM grams GROUP BY gram
        ORDER BY n DESC, gram ASC
        LIMIT 20
    """,
}
