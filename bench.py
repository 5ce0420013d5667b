"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query seconds.

Each query is forced to full execution with a noop-format write (no driver
collect, no result materialization cost — measures the distributed plan)."""

from __future__ import annotations

import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

warnings.filterwarnings("ignore")
os.environ.setdefault("PYTHONWARNINGS", "ignore")

# --interleave <rev>: delegate to the paired A/B harness
# (tools/bench_interleave.py) — frozen-rev and HEAD timings measured
# adjacent in time so no-regression claims stop depending on
# cross-day medians. Everything after <rev> passes through.
if len(sys.argv) > 2 and sys.argv[1] == "--interleave":
    _tool = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tools",
        "bench_interleave.py",
    )
    os.execv(
        sys.executable,
        [sys.executable, _tool, "--rev", sys.argv[2], *sys.argv[3:]],
    )

# The driver parses stdout as a single JSON line. The JVM (log4j banner,
# "Setting default log level", ivy) and any library print can land on fd 1,
# so swap fd 1 to stderr for the whole run and keep a private dup of the
# real stdout for the one JSON line at the end. The JVM inherits the
# redirected fd at launch, so nothing it writes can corrupt the output.
_REAL_STDOUT = os.dup(1)
os.dup2(2, 1)
sys.stdout = sys.stderr

from aind_data_transformation_spark.queries import registry
from aind_data_transformation_spark.session import build_session


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def emit(payload: dict) -> None:
    # compact separators halve the line length (the driver's stdout
    # capture has truncated the pretty form mid-dict in past rounds),
    # and the same payload is persisted to bench_last.json so a
    # truncated capture can always be adjudicated from the file.
    line = json.dumps(payload, separators=(",", ":"))
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_last.json"),
            "w",
        ) as fh:
            fh.write(line + "\n")
    except OSError as exc:
        print(f"# bench_last.json write failed: {exc}", file=sys.stderr)
    os.write(_REAL_STDOUT, (line + "\n").encode())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry()

    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once with the flagship query, and
    # the Python/Arrow worker pool with a 1-row pandas pass — otherwise
    # the first Arrow-tier key in sort order pays the one-time ~2 s
    # worker spin-up and reads as an outlier instead of steady state
    force(queries["agg_group"](spark, sf_dir))
    # range(1) is ONE partition and warms ONE python worker — the first
    # Arrow-tier key then pays ~2-3 s spawning the other 31. Spread the
    # warmup over every core so the pool it claims to warm exists.
    n = int(cpus)
    spark.range(0, n * 2, 1, n).mapInPandas(lambda it: it, "id long").count()
    # Stage the ANN IVF physical index (quantizer training + the
    # partitionBy(cell) layout write) OUTSIDE the per-key timers and
    # report its one-time cost separately: the index is built once and
    # amortized over every probe, so folding it into whichever ANN key
    # happens to run first (r8: ann_ivf_partition_pruned absorbed ~8 s
    # of adopted build cost) misreads as probe cost. Serve entries below
    # now measure serving.
    ann_index_build_s = None
    try:
        from aind_data_transformation_spark.queries import llm_vectors

        t0 = time.monotonic()
        llm_vectors._ivf_partitioned_dir(spark, sf_dir)
        ann_index_build_s = round(time.monotonic() - t0, 3)
    except Exception as exc:
        print(f"# ann index warmup failed: {exc}", file=sys.stderr)
    # Same treatment for the image-hash stage (encode + decode + dHash,
    # shared by both phash keys): computed once per session, so its
    # one-time cost is reported separately instead of landing on
    # whichever phash key runs first.
    phash_stage_build_s = None
    try:
        t0 = time.monotonic()
        llm_vectors._phash_staged(spark, sf_dir).count()
        phash_stage_build_s = round(time.monotonic() - t0, 3)
    except Exception as exc:
        print(f"# phash stage warmup failed: {exc}", file=sys.stderr)
    # Session-staged fixtures shared across key families (r12 verdict
    # item #2): each is built ONCE per (session, sf_dir) by design and
    # was previously absorbed by whichever family key ran first in sort
    # order, misreading one-time staging as that key's serving cost.
    # Stage them here (same builders the keys call — the keys themselves
    # are unchanged and still self-stage when run standalone) and report
    # each build's one-time cost as its own JSON field, exactly like
    # ann_index_build_s above. Additions-only: the queries dict keeps
    # every key, the one-line contract and env handling are untouched.
    stage_builds: dict[str, float | None] = {
        # the deterministic 4-batch orders fixture behind the ~25 engine
        # txlog keys (absorbed by the first scan_txlog_* key before)
        "txlog_fixture_build_s": None,
        # the 4-chunk streaming source dirs (stream_txlog_* / CDC /
        # minhash deliveries)
        "txlog_stream_stage_build_s": None,
        "cdc_stage_build_s": None,
        "minhash_stage_build_s": None,
        # the co-purchase support table shared by the 11 graph keys
        # (absorbed by basket_assoc_rules before)
        "copurchase_build_s": None,
        # the learned BPE merge table (absorbed by bpe_encode_apply)
        "bpe_merges_build_s": None,
    }

    def _stage(field: str, fn) -> None:
        try:
            t0 = time.monotonic()
            fn()
            stage_builds[field] = round(time.monotonic() - t0, 3)
        except Exception as exc:
            print(f"# stage build {field} failed: {exc}", file=sys.stderr)

    try:
        from aind_data_transformation_spark.queries import (
            graph as _graph,
            ml_prep as _ml_prep,
            sinks as _sinks,
            streaming_batch as _sb,
        )

        _stage(
            "txlog_fixture_build_s",
            lambda: _sinks._txlog_fixture_batches(spark, sf_dir),
        )
        _stage(
            "txlog_stream_stage_build_s",
            lambda: _sb._txlog_sink_stage(spark, sf_dir),
        )
        _stage("cdc_stage_build_s", lambda: _sb._cdc_stage(spark, sf_dir))
        _stage(
            "minhash_stage_build_s", lambda: _sb._minhash_stage(spark, sf_dir)
        )
        _stage(
            "copurchase_build_s",
            lambda: _graph._copurchase_support(spark, sf_dir),
        )
        _stage(
            "bpe_merges_build_s",
            lambda: _ml_prep._bpe_learned_merges(spark, sf_dir),
        )
    except Exception as exc:
        print(f"# stage-build warmup failed: {exc}", file=sys.stderr)
    # The Python DataSource path runs its own worker kind (plain Python
    # workers with the datasource serializer, not the Arrow-UDF pool
    # warmed above) — one tiny single-partition read spins it up so the
    # first txlog-connector key measures the read, not worker adoption.
    try:
        import json as _json
        import tempfile as _tempfile

        from aind_data_transformation_spark.io import txlog_source

        tiny = os.path.join(_tempfile.mkdtemp(), "t")
        spark.range(1).selectExpr("id AS o_orderkey").coalesce(1).write.parquet(
            os.path.join(tiny, "data", "batch-0")
        )
        os.makedirs(os.path.join(tiny, "_log"), exist_ok=True)
        with open(os.path.join(tiny, "_log", "00000.json"), "w") as fh:
            fh.write(_json.dumps({
                "commit": 0, "action": "add",
                "path": os.path.join(tiny, "data", "batch-0"),
            }) + "\n")
        txlog_source.register(spark)
        spark.read.format("txlog").option(
            "path", os.path.join(tiny, "_log")
        ).load().count()
        # a FILTERED read plans through the pushFilters worker path —
        # warm it too so the pruned-scan keys measure the scan
        spark.read.format("txlog").option(
            "path", os.path.join(tiny, "_log")
        ).load().where("o_orderkey >= 0").count()
        # the WRITE half runs Arrow-serializer python workers of its
        # own — one 2-row connector write adopts that pool too, so the
        # first sink_txlog_datasource_write* key measures the write,
        # not worker spin-up
        (
            spark.range(2)
            .selectExpr("id AS o_orderkey")
            .write.format("txlog")
            .mode("append")
            .option("stats_col", "o_orderkey")
            .save(os.path.join(_tempfile.mkdtemp(), "w", "_log"))
        )
    except Exception as exc:
        print(f"# datasource warmup failed: {exc}", file=sys.stderr)
    # SPARK_GRAFT_KEYS=k1,k2 restricts the run (new-key spot timing /
    # drift adjudication); unset = the full registry, the driver's mode
    only = {
        k.strip()
        for k in os.environ.get("SPARK_GRAFT_KEYS", "").split(",")
        if k.strip()
    }
    run_keys = sorted(only & set(queries)) if only else sorted(queries)
    for key in run_keys:
        start = time.monotonic()
        try:
            force(queries[key](spark, sf_dir))
            timings[key] = round(time.monotonic() - start, 3)
        except Exception as exc:  # keep the bench line intact
            timings[key] = -1.0
            print(f"# bench error in {key}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark.stop()
    emit(
        {
            "metric": "total_query_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            # one-time ANN index build (quantizer + partitionBy(cell)
            # layout), staged in warmup — NOT part of any query's entry
            "ann_index_build_s": ann_index_build_s,
            # one-time image-hash stage (PNG encode+decode+dHash),
            # shared by the phash keys — staged in warmup likewise
            "phash_stage_build_s": phash_stage_build_s,
            # per-family session-stage builds (r12 verdict item #2) —
            # one-time costs, reported separately so family keys
            # measure serving; see the stage warmup above
            **stage_builds,
        }
    )


if __name__ == "__main__":
    main()
