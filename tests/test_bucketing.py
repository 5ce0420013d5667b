"""Bucketed tables: the co-located join path (SURVEY.md §4 / 100-TB
design). Writing both sides bucketed+sorted on the join key lets Spark
plan a SortMergeJoin with ZERO Exchange operators — the decisive layout
optimization for repeatedly-joined fact tables at scale."""

from __future__ import annotations

import contextlib
import io
import uuid

from pyspark.sql import functions as F

from tests.conftest import TEST_SF_DIR

from aind_data_transformation_spark.io.sources import load_table


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    o = load_table(spark, TEST_SF_DIR, "orders")
    li = load_table(spark, TEST_SF_DIR, "lineitem")
    tag = uuid.uuid4().hex[:8]
    for name, df, key in (
        (f"orders_b_{tag}", o, "o_orderkey"),
        (f"lineitem_b_{tag}", li, "l_orderkey"),
    ):
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )

    # MERGE hint: at toy scale the planner would broadcast the small side
    # and never exercise the bucketed path (and the old split-based
    # assertion was vacuous — it only inspected the plan header)
    joined = (
        spark.table(f"orders_b_{tag}")
        .hint("merge")
        .join(
            spark.table(f"lineitem_b_{tag}"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed-on-key join + bucket-key groupBy must not shuffle"
    )

    # and it is still correct
    want = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))

    for name in (f"orders_b_{tag}", f"lineitem_b_{tag}"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
