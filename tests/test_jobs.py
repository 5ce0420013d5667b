"""End-to-end concrete jobs through the framework surface: settings ->
GenericSparkEtl subclass -> run_job() -> JobResponse with metrics —
the exact usage pattern a reference user brings over."""

from __future__ import annotations

import json

import duckdb

from tests.conftest import TEST_SF_DIR

from aind_data_transformation_spark.jobs import (
    CorpusCleanJob,
    CorpusCleanJobSettings,
    FormatConversionJob,
    FormatConversionJobSettings,
)


def test_format_conversion_parquet_to_json_roundtrip(spark, tmp_path):
    out = tmp_path / "nation_json"
    job = FormatConversionJob(
        FormatConversionJobSettings(
            input_source=f"{TEST_SF_DIR}/nation.parquet",
            output_directory=str(out),
            output_format="json",
            compression="gzip",
        ),
        spark=spark,
    )
    resp = job.run_job()
    assert resp.status_code == 200
    metrics = json.loads(resp.data)
    reread = spark.read.json(str(out))
    assert reread.count() == metrics["rows_written"] > 0
    assert set(reread.columns) == {"n_nationkey", "n_name", "n_regionkey"}


def test_format_conversion_partitioned_parquet(spark, tmp_path):
    out = tmp_path / "orders_by_status"
    job = FormatConversionJob(
        FormatConversionJobSettings(
            input_source=f"{TEST_SF_DIR}/orders.parquet",
            output_directory=str(out),
            partition_by=["o_orderstatus"],
            target_partitions=4,
        ),
        spark=spark,
    )
    resp = job.run_job()
    assert resp.status_code == 200
    dirs = {p.name for p in out.iterdir() if p.name.startswith("o_orderstatus=")}
    assert dirs == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}


def test_format_conversion_rejects_unknown_format(spark, tmp_path):
    job = FormatConversionJob(
        FormatConversionJobSettings(
            input_source=f"{TEST_SF_DIR}/nation.parquet",
            output_directory=str(tmp_path / "x"),
            output_format="avro",
        ),
        spark=spark,
    )
    assert job.run_job().status_code == 400


def test_corpus_clean_job_matches_oracle(spark, tmp_path):
    out = tmp_path / "clean_docs"
    job = CorpusCleanJob(
        CorpusCleanJobSettings(
            input_source=f"{TEST_SF_DIR}/documents.parquet",
            output_directory=str(out),
        ),
        spark=spark,
    )
    resp = job.run_job()
    assert resp.status_code == 200
    metrics = json.loads(resp.data)
    assert metrics["rows_in"] > metrics["rows_out"] > 0

    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH gated AS (
            SELECT * FROM read_parquet('{TEST_SF_DIR}/documents.parquet')
            WHERE lang IN ('en','de','fr')
              AND n_chars BETWEEN 50 AND 5000
              AND len(string_split(text, ' ')) >= 10
        )
        SELECT COUNT(*) FROM gated
        WHERE doc_id = (SELECT MIN(doc_id) FROM gated g2 WHERE g2.text = gated.text)
        """
    ).fetchone()[0]
    assert metrics["rows_out"] == want
    got_ids = {
        r.doc_id for r in spark.read.parquet(str(out)).select("doc_id").collect()
    }
    want_ids = {
        r[0]
        for r in con.execute(
            f"""
            WITH gated AS (
                SELECT * FROM read_parquet('{TEST_SF_DIR}/documents.parquet')
                WHERE lang IN ('en','de','fr')
                  AND n_chars BETWEEN 50 AND 5000
                  AND len(string_split(text, ' ')) >= 10
            )
            SELECT doc_id FROM gated
            WHERE doc_id = (SELECT MIN(doc_id) FROM gated g2 WHERE g2.text = gated.text)
            """
        ).fetchall()
    }
    assert got_ids == want_ids


def test_compaction_job_reduces_file_count(spark, tmp_path):
    from aind_data_transformation_spark.jobs import (
        CompactionJob,
        CompactionJobSettings,
    )

    # simulate a streaming sink's small-files mess: 64 tiny files
    src = tmp_path / "fragmented"
    orders = spark.read.parquet(f"{TEST_SF_DIR}/orders.parquet")
    orders.repartition(64).write.parquet(str(src))
    assert len(list(src.glob("part-*.parquet"))) == 64

    out = tmp_path / "compacted"
    resp = CompactionJob(
        CompactionJobSettings(
            input_source=str(src),
            output_directory=str(out),
            target_file_bytes=1024 * 1024,
        ),
        spark=spark,
    ).run_job()
    assert resp.status_code == 200
    metrics = json.loads(resp.data)
    n_files = len(list(out.glob("part-*.parquet")))
    assert n_files == metrics["output_files"] < 64
    assert spark.read.parquet(str(out)).count() == metrics["rows_written"] == orders.count()


def test_near_dup_resolve_job_collapses_planted_clusters(spark, tmp_path):
    from aind_data_transformation_spark.jobs import (
        NearDupResolveJob,
        NearDupResolveJobSettings,
    )

    # Plant near-dup clusters: for each of 5 base docs, add two variants
    # that differ by one appended token (trigram-Jaccard stays >= 0.7 for
    # long docs), on top of a corpus of distinct docs.
    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .where("length(text) > 400")
        .orderBy("doc_id")
        .limit(40)
        .select("doc_id", "text")
        .cache()
    )
    base = docs.limit(5)
    v1 = base.selectExpr(
        "doc_id + 1000000 AS doc_id", "concat(text, ' extrawordone') AS text"
    )
    v2 = base.selectExpr(
        "doc_id + 2000000 AS doc_id", "concat(text, ' extrawordtwo') AS text"
    )
    src = tmp_path / "planted"
    docs.unionByName(v1).unionByName(v2).write.parquet(str(src))

    out = tmp_path / "resolved"
    resp = NearDupResolveJob(
        NearDupResolveJobSettings(
            input_source=str(src), output_directory=str(out)
        ),
        spark=spark,
    ).run_job()
    assert resp.status_code == 200
    metrics = json.loads(resp.data)
    assert metrics["rows_in"] == 50

    survivors = {
        r.doc_id for r in spark.read.parquet(str(out)).select("doc_id").collect()
    }
    # No planted variant can survive: each variant's cluster contains its
    # base doc, whose id is smaller, so the variant is never the cluster
    # minimum. (Base docs themselves may merge into bigger clusters — the
    # source corpus has its own planted near-dups — so we don't assert
    # on them individually.)
    assert all(doc_id < 1000000 for doc_id in survivors)
    # at least the 10 planted variants were dropped, bookkeeping consistent
    assert metrics["rows_dropped"] >= 10
    assert metrics["rows_out"] + metrics["rows_dropped"] == 50
    assert len(survivors) == metrics["rows_out"]


def test_format_conversion_orc_roundtrip(spark, tmp_path):
    """parquet -> orc -> parquet through two job runs preserves rows."""
    orc_dir, back_dir = tmp_path / "as_orc", tmp_path / "back"
    r1 = FormatConversionJob(
        FormatConversionJobSettings(
            input_source=f"{TEST_SF_DIR}/customer.parquet",
            output_directory=str(orc_dir),
            output_format="orc",
        ),
        spark=spark,
    ).run_job()
    assert r1.status_code == 200
    r2 = FormatConversionJob(
        FormatConversionJobSettings(
            input_source=str(orc_dir),
            input_format="orc",
            output_directory=str(back_dir),
            output_format="parquet",
        ),
        spark=spark,
    ).run_job()
    assert r2.status_code == 200
    orig = spark.read.parquet(f"{TEST_SF_DIR}/customer.parquet")
    back = spark.read.parquet(str(back_dir))
    assert back.count() == orig.count() == json.loads(r2.data)["rows_written"]
    assert set(back.columns) == set(orig.columns)


def test_neardup_parquet_materialization_identical_to_checkpoint(
    spark, tmp_path
):
    """The fault-tolerant parquet stage-materialization mode must be
    byte-identical to the default localCheckpoint mode — same survivors,
    same metrics — and must actually write its stages to disk."""
    import json

    from aind_data_transformation_spark.jobs import (
        NearDupResolveJob,
        NearDupResolveJobSettings,
    )

    docs = (
        spark.read.parquet(f"{TEST_SF_DIR}/documents.parquet")
        .where("length(text) > 400")
        .orderBy("doc_id")
        .limit(30)
        .select("doc_id", "text")
    )
    base = docs.limit(4)
    variants = base.selectExpr(
        "doc_id + 1000000 AS doc_id", "concat(text, ' extraword') AS text"
    )
    src = tmp_path / "planted"
    docs.unionByName(variants).write.parquet(str(src))

    results = {}
    for mode in ("checkpoint", "parquet"):
        out = tmp_path / f"resolved_{mode}"
        mat_dir = str(tmp_path / "stages") if mode == "parquet" else None
        resp = NearDupResolveJob(
            NearDupResolveJobSettings(
                input_source=str(src),
                output_directory=str(out),
                materialize_dir=mat_dir,
            ),
            spark=spark,
        ).run_job()
        assert resp.status_code == 200
        survivors = sorted(
            r.doc_id
            for r in spark.read.parquet(str(out)).select("doc_id").collect()
        )
        results[mode] = (survivors, json.loads(resp.data)["rows_out"])

    assert results["checkpoint"] == results["parquet"]
    staged = list((tmp_path / "stages").glob("*.parquet"))
    assert staged, "parquet mode must write stage directories"


def test_training_corpus_pipeline_end_to_end(spark, tmp_path):
    """The capstone pipeline: gate -> exact dedup -> near-dup ->
    decontaminate -> shard write. Checks monotone stage counts, the
    hive-sharded output layout, determinism across reruns, and that the
    staged (durable-boundary) mode produces the identical corpus."""
    import os

    from aind_data_transformation_spark.jobs import (
        TrainingCorpusPipelineJob,
        TrainingCorpusPipelineJobSettings,
    )

    out1 = tmp_path / "corpus_a"
    resp = TrainingCorpusPipelineJob(
        TrainingCorpusPipelineJobSettings(
            input_source=f"{TEST_SF_DIR}/documents.parquet",
            output_directory=str(out1),
            n_shards=4,
        ),
        spark=spark,
    ).run_job()
    assert resp.status_code == 200
    m = json.loads(resp.data)
    assert (
        m["rows_in"] >= m["rows_gated"] >= m["rows_after_neardup"]
        >= m["rows_clean"] > 0
    )
    # bench sources are gone and the output is hive-sharded
    shard_dirs = [d for d in os.listdir(out1) if d.startswith("shard=")]
    assert 1 <= len(shard_dirs) <= 4
    got = spark.read.parquet(str(out1))
    assert got.where(got.source.isin("src0", "src1")).count() == 0
    ids1 = sorted(r.doc_id for r in got.select("doc_id").collect())

    # rerun with durable staging: identical surviving corpus
    out2 = tmp_path / "corpus_b"
    TrainingCorpusPipelineJob(
        TrainingCorpusPipelineJobSettings(
            input_source=f"{TEST_SF_DIR}/documents.parquet",
            output_directory=str(out2),
            n_shards=4,
            staging_dir=str(tmp_path / "staging"),
        ),
        spark=spark,
    ).run_job()
    ids2 = sorted(
        r.doc_id
        for r in spark.read.parquet(str(out2)).select("doc_id").collect()
    )
    assert ids1 == ids2


def test_session_knobs_shuffle_partitions_and_state_store(spark, tmp_path):
    """The SCALE.md cluster knobs are real settings: shuffle_partitions
    and streaming_state_store apply to the session (runtime confs, safe
    on an externally-owned session); checkpoint_dir feeds the parquet
    materializer fallback."""
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        job = FormatConversionJob(
            FormatConversionJobSettings(
                input_source=f"{TEST_SF_DIR}/nation.parquet",
                output_directory=str(tmp_path / "out"),
                shuffle_partitions=7,
                streaming_state_store="rocksdb",
            ),
            spark=spark,
        )
        s = job.spark  # applies the knobs
        assert s.conf.get("spark.sql.shuffle.partitions") == "7"
        assert "RocksDBStateStoreProvider" in s.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
        resp = job.run_job()
        assert resp.status_code == 200
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_checkpoint_dir_fallback_feeds_materializer(spark, tmp_path):
    """NearDupResolveJob with only the base checkpoint_dir set must
    stage its iterative work as parquet under that directory."""
    import os

    from aind_data_transformation_spark.jobs import (
        NearDupResolveJob,
        NearDupResolveJobSettings,
    )

    ck = tmp_path / "ck"
    job = NearDupResolveJob(
        NearDupResolveJobSettings(
            input_source=f"{TEST_SF_DIR}/documents.parquet",
            output_directory=str(tmp_path / "out"),
            checkpoint_dir=str(ck),
        ),
        spark=spark,
    )
    resp = job.run_job()
    assert resp.status_code == 200
    staged = os.listdir(ck)
    assert staged, "no parquet stage materialized under checkpoint_dir"


def test_ann_index_build_job_publishes_and_validates(spark, tmp_path):
    """AnnIndexBuildJob end-to-end: packed code table + bounds sidecar
    land on disk, the published index answers probe queries, and the
    validation recall clears the publish gate."""
    import json as _json

    from aind_data_transformation_spark.jobs import (
        AnnIndexBuildJob,
        AnnIndexBuildJobSettings,
    )

    out = tmp_path / "ann_index"
    job = AnnIndexBuildJob(
        AnnIndexBuildJobSettings(
            input_source=f"{TEST_SF_DIR}/embeddings.parquet",
            output_directory=str(out),
        ),
        spark=spark,
    )
    resp = job.run_job()
    assert resp.status_code == 200, resp.message
    m = _json.loads(resp.data)
    assert m["recall_at_k"] >= 0.6
    codes = spark.read.parquet(str(out / "codes"))
    assert codes.count() == m["n_vectors"] > 0
    row = codes.first()
    assert len(row["w"]) == 4  # 4 packed BIGINT words = 32 bytes/vector
    b = spark.read.parquet(str(out / "bounds")).first()
    assert len(b["mn"]) == 64 and len(b["mx"]) == 64


def test_streaming_ingest_job_incremental(spark, tmp_path):
    """Two CLI-level invocations of StreamingIngestJob over a growing
    source dir: run 2 drains ONLY the new file (checkpointed offsets),
    appends only newly-finalized windows, and the union of both runs'
    sink rows equals the batch aggregation over the watermark-finalized
    region — incremental, exactly-once."""
    import json as _json

    from pyspark.sql import functions as F

    from aind_data_transformation_spark.jobs import (
        StreamingIngestJob,
        StreamingIngestJobSettings,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.read.parquet(f"{TEST_SF_DIR}/events.parquet").orderBy("ts")
    n = ev.count()
    first, second = ev.limit(n // 2), ev.subtract(ev.limit(n // 2))
    first.coalesce(1).write.mode("append").parquet(src)

    def run():
        job = StreamingIngestJob(
            StreamingIngestJobSettings(
                input_source=src,
                output_directory=out,
                checkpoint_dir=ckpt,
            ),
            spark=spark,
        )
        resp = job.run_job()
        assert resp.status_code == 200
        return _json.loads(resp.data)["sink_rows_total"]

    n1 = run()
    second.coalesce(1).write.mode("append").parquet(src)
    n2 = run()
    assert n2 >= n1

    sink = spark.read.parquet(out)
    # exactly-once: no window/type appears twice
    dup = (
        sink.groupBy("win_start", "event_type")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    # every sink row matches the batch aggregation over the full source
    batch = (
        spark.read.parquet(src)
        .groupBy(
            F.window("ts", "10 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events"
        )
    )
    got = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in sink.collect()
    }
    want = {
        (r["win_start"], r["event_type"]): r["n_events"]
        for r in batch.collect()
    }
    assert got, "no finalized windows written"
    for k, v in got.items():
        assert want.get(k) == v, k
