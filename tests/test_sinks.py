"""Physical-layout assertions for the sink operators (the parts the
row-value oracle can't see): partition directory structure, file counts,
and codec."""

from __future__ import annotations

import glob
import os
import tempfile

from tests.conftest import TEST_SF_DIR

from aind_data_transformation_spark.queries import sinks


def _scratch(name: str) -> str:
    tag = TEST_SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(tempfile.gettempdir(), "spark_graft_sinks", tag, name)


def test_partitioned_sink_layout(spark):
    sinks.q_sink_parquet_partitioned(spark, TEST_SF_DIR).collect()
    out = _scratch("lineitem_by_flag")
    part_dirs = sorted(
        d for d in os.listdir(out) if d.startswith("l_returnflag=")
    )
    assert part_dirs == ["l_returnflag=A", "l_returnflag=N", "l_returnflag=R"]
    files = glob.glob(os.path.join(out, "l_returnflag=A", "*.zstd.parquet"))
    assert files, "expected zstd-codec parquet files in each partition"


def test_repartition_sink_file_count(spark):
    sinks.q_sink_repartition(spark, TEST_SF_DIR).collect()
    out = _scratch("orders_repart")
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert len(files) == 8
