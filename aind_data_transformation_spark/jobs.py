"""Concrete ETL jobs: what a reference user writes against the framework
(subclass the generic job, implement ``run_job``, get a ``JobResponse`` —
reference README.md:12-47 usage pattern), rebuilt as Spark pipelines.

Two jobs cover the reference's documented job domain plus the engine's
LLM-pipeline extension:

* :class:`FormatConversionJob` — the reference's literal purpose
  ("compression and format conversion", reference pyproject.toml:7,
  README.md:12): read any supported format, write any other, with codec,
  partitioning, and file-count control from settings.
* :class:`CorpusCleanJob` — the 100-TB training-data shape: language/
  quality gate -> exact dedup -> near-dup candidate drop, one declarative
  plan, metrics in ``JobResponse.data``.
* :class:`NearDupResolveJob` — the fuzzy tier CorpusCleanJob's exact hash
  can't catch: MinHash-LSH candidates -> exact-Jaccard verification ->
  connected components -> keep one survivor per duplicate cluster.
"""

from __future__ import annotations

import json
import time
from typing import Optional

from pyspark.sql import DataFrame, Observation, functions as F

from aind_data_transformation_spark.core import (
    GenericSparkEtl,
    JobResponse,
    SparkJobSettings,
)
from aind_data_transformation_spark.ops import (
    attach_broadcast,
    connected_components,
    knuth32,
    parquet_materializer,
)
from aind_data_transformation_spark.texthash import verified_near_dups


class FormatConversionJobSettings(SparkJobSettings):
    """IO knobs are inherited: input_format/output_format (parquet, csv,
    json), compression, partition_by, target_partitions."""


class FormatConversionJob(GenericSparkEtl[FormatConversionJobSettings]):
    """Read ``input_source`` in ``input_format``, write ``output_directory``
    in ``output_format`` with the requested codec / partitioning / file
    count. The whole job is one scan->write plan: no driver materialization,
    so it streams through executors at any scale."""

    def _read(self) -> DataFrame:
        s = self.job_settings
        reader = self.spark.read
        if s.input_format == "parquet":
            return reader.parquet(str(s.input_source))
        if s.input_format == "csv":
            return reader.option("header", "true").option("inferSchema", "true").csv(
                str(s.input_source)
            )
        if s.input_format == "json":
            return reader.json(str(s.input_source))
        if s.input_format == "orc":
            return reader.orc(str(s.input_source))
        raise ValueError(f"unsupported input_format: {s.input_format}")

    def run_job(self) -> JobResponse:
        started = time.time()
        s = self.job_settings
        df = self._read()
        # row count rides along with the write (df.observe) — a separate
        # count() would scan the full input a second time, which at 100 TB
        # doubles the job cost
        obs = Observation("fmt_conv")
        df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        if s.target_partitions:
            df = df.repartition(s.target_partitions)
        # columnar codecs (zstd) aren't available for the text sinks in a
        # stock Hadoop build — degrade to gzip rather than fail the job
        codec = s.compression
        if s.output_format in ("csv", "json") and codec in ("zstd", "lz4raw"):
            codec = "gzip"
        writer = df.write.mode("overwrite").option("compression", codec)
        if s.partition_by:
            writer = writer.partitionBy(*s.partition_by)
        out = str(s.output_directory)
        if s.output_format == "parquet":
            writer.parquet(out)
        elif s.output_format == "csv":
            writer.option("header", "true").csv(out)
        elif s.output_format == "json":
            writer.json(out)
        elif s.output_format == "orc":
            writer.orc(out)
        else:
            return JobResponse(
                status_code=400,
                message=f"unsupported output_format: {s.output_format}",
            )
        return JobResponse(
            status_code=200,
            message="ok",
            data=json.dumps(
                {
                    "rows_written": int(obs.get["n_rows"]),
                    "output_format": s.output_format,
                    "compression": codec,
                    "seconds": round(time.time() - started, 3),
                }
            ),
        )


class CompactionJobSettings(SparkJobSettings):
    target_file_bytes: int = 128 * 1024 * 1024


class CompactionJob(GenericSparkEtl[CompactionJobSettings]):
    """Small-files compaction: rewrite a parquet directory into files of
    ~``target_file_bytes`` each. The #1 recurring maintenance job on any
    large lake — streaming sinks and over-parallel writers leave thousands
    of tiny files that wreck scan planning (one task per file) and listing.

    File count is sized from the actual on-disk bytes; the rewrite is a
    single scan->repartition->write plan (one shuffle, no driver data)."""

    def run_job(self) -> JobResponse:
        started = time.time()
        s = self.job_settings
        src = str(s.input_source)
        df = self.spark.read.parquet(src)
        # on-disk size via the Hadoop FS API (works for any scheme)
        jvm = self.spark.sparkContext._jvm
        jsc = self.spark.sparkContext._jsc
        path = jvm.org.apache.hadoop.fs.Path(src)
        fs = path.getFileSystem(jsc.hadoopConfiguration())
        total_bytes = fs.getContentSummary(path).getLength()
        n_files = max(1, -(-total_bytes // s.target_file_bytes))  # ceil
        obs = Observation("compaction")
        df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        df.repartition(int(n_files)).write.mode("overwrite").option(
            "compression", s.compression
        ).parquet(str(s.output_directory))
        return JobResponse(
            status_code=200,
            message="ok",
            data=json.dumps(
                {
                    "rows_written": int(obs.get["n_rows"]),
                    "input_bytes": int(total_bytes),
                    "output_files": int(n_files),
                    "seconds": round(time.time() - started, 3),
                }
            ),
        )


class CorpusCleanJobSettings(SparkJobSettings):
    langs: list[str] = ["en", "de", "fr"]
    min_chars: int = 50
    max_chars: int = 5000
    min_tokens: int = 10


class CorpusCleanJob(GenericSparkEtl[CorpusCleanJobSettings]):
    """Pretraining-corpus cleaning: quality gate -> exact-hash dedup
    (min-doc_id survivor) -> write. Everything is one declarative plan —
    the dedup is a single window over sha256(text), no collect, no loop."""

    def run_job(self) -> JobResponse:
        from pyspark.sql import Window

        started = time.time()
        s = self.job_settings
        docs = self.spark.read.parquet(str(s.input_source))
        # both counts ride the single write pass: one observation on the
        # raw scan, one on the final plan — no extra count() scan of the
        # input and no re-read of the output
        obs_in = Observation("corpus_in")
        obs_out = Observation("corpus_out")
        docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n"))

        toks = F.split("text", " ")
        gated = docs.where(
            F.col("lang").isin(s.langs)
            & F.col("n_chars").between(s.min_chars, s.max_chars)
            & (F.size(toks) >= s.min_tokens)
        )
        w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
        deduped = (
            gated.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
            .observe(obs_out, F.count(F.lit(1)).alias("n"))
        )
        deduped.write.mode("overwrite").option(
            "compression", s.compression
        ).parquet(str(s.output_directory))
        n_in = int(obs_in.get["n"])
        n_out = int(obs_out.get["n"])
        return JobResponse(
            status_code=200,
            message="ok",
            data=json.dumps(
                {
                    "rows_in": n_in,
                    "rows_out": n_out,
                    "rows_dropped": n_in - n_out,
                    "seconds": round(time.time() - started, 3),
                }
            ),
        )


class NearDupResolveJobSettings(SparkJobSettings):
    jaccard_threshold: float = 0.7
    #: When set, pipeline stages (LSH bands, candidate pairs, trigram
    #: sets, per-round component labels) materialize as parquet under this
    #: directory instead of ``localCheckpoint`` — the fault-tolerant mode
    #: for cluster runs: a lost executor replays from durable storage
    #: rather than recomputing from nothing. Leave unset in local mode.
    materialize_dir: Optional[str] = None


class NearDupResolveJob(GenericSparkEtl[NearDupResolveJobSettings]):
    """Fuzzy dedup tier: resolve near-duplicate documents into clusters
    and keep one survivor per cluster.

    Pipeline (all distributed, no driver data): MinHash-LSH candidate
    pairs -> exact trigram-Jaccard verification (>= threshold) ->
    connected components over the duplicate edges -> anti-join the
    non-survivors out of the corpus. At 100 TB the expensive stages are
    bounded by the candidate set (LSH buckets), not the corpus: the
    verify join and the component graph only ever see docs that share a
    signature band."""

    def run_job(self) -> JobResponse:
        started = time.time()
        s = self.job_settings
        docs = self.spark.read.parquet(str(s.input_source))
        n_in = docs.count()

        mat_dir = s.materialize_dir or (
            str(s.checkpoint_dir) if s.checkpoint_dir else None
        )
        mat = parquet_materializer(mat_dir) if mat_dir else None
        edges = verified_near_dups(
            docs,
            "doc_id",
            "text",
            threshold=s.jaccard_threshold,
            materializer=mat,
        )
        comps = connected_components(edges, "id_a", "id_b", materializer=mat)
        # survivor = min doc_id per component == the component label itself
        losers = comps.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        survivors = docs.join(losers, "doc_id", "left_anti")
        survivors.write.mode("overwrite").option(
            "compression", s.compression
        ).parquet(str(s.output_directory))
        n_out = self.spark.read.parquet(str(s.output_directory)).count()
        n_clusters = comps.select("component").distinct().count()
        return JobResponse(
            status_code=200,
            message="ok",
            data=json.dumps(
                {
                    "rows_in": n_in,
                    "rows_out": n_out,
                    "near_dup_clusters": n_clusters,
                    "rows_dropped": n_in - n_out,
                    "seconds": round(time.time() - started, 3),
                }
            ),
        )


class TrainingCorpusPipelineJobSettings(SparkJobSettings):
    """End-to-end corpus build: gate -> exact dedup -> near-dup resolve ->
    benchmark decontamination -> deterministic shard write."""

    langs: list[str] = ["en", "de", "fr"]
    min_chars: int = 50
    max_chars: int = 5000
    min_tokens: int = 10
    jaccard_threshold: float = 0.7
    #: sources treated as evaluation benchmarks; any training doc sharing
    #: a token 8-gram with them is dropped (and bench docs themselves are
    #: excluded from the output corpus)
    bench_sources: list[str] = ["src0", "src1"]
    n_shards: int = 16
    #: When set, every stage boundary materializes as parquet under this
    #: directory (stage1_gated/, stage2_neardup/, stage3_clean/) — the
    #: fault-tolerant cluster mode: a stage failure restarts from the last
    #: durable boundary, and lost executors replay from storage. Unset,
    #: the stages chain as one lazy plan (fine in local mode).
    staging_dir: Optional[str] = None


class TrainingCorpusPipelineJob(
    GenericSparkEtl[TrainingCorpusPipelineJobSettings]
):
    """The 100-TB training-corpus pipeline as ONE job: every stage is the
    operator already proven in isolation (CorpusCleanJob's gate+dedup,
    NearDupResolveJob's LSH->verify->components, corpus_decontaminate's
    8-gram probe, corpus_shuffle_shard's deterministic sharding), chained
    with optional durable staging between them.

    Scale shape per stage: (1) gate is a scan-level filter + one
    hash-window dedup on sha256(text); (2) near-dup cost is bounded by
    LSH bucket collisions, never corpus²; (3) the benchmark 8-gram set is
    distinct-small -> broadcast left-anti probe, zero shuffle of the
    training side; (4) the shard write repartitions on the shard id so
    each output directory is written in parallel with bounded file
    counts."""

    def _stage(self, df: DataFrame, name: str) -> DataFrame:
        s = self.job_settings
        staging = s.staging_dir or (
            str(s.checkpoint_dir) if s.checkpoint_dir else None
        )
        if not staging:
            return df
        path = f"{staging}/{name}"
        df.write.mode("overwrite").parquet(path)
        return self.spark.read.parquet(path)

    def run_job(self) -> JobResponse:
        from pyspark.sql import Window

        started = time.time()
        s = self.job_settings
        docs = self.spark.read.parquet(str(s.input_source))
        n_in = docs.count()

        # stage 1: quality gate + exact dedup (min-doc_id survivor)
        toks = F.split("text", " ")
        gated = docs.where(
            F.col("lang").isin(s.langs)
            & F.col("n_chars").between(s.min_chars, s.max_chars)
            & (F.size(toks) >= s.min_tokens)
        )
        w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
        exact = (
            gated.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        exact = self._stage(exact, "stage1_gated")
        n_gated = exact.count()

        # stage 2: near-dup clusters -> one survivor per cluster
        staging = s.staging_dir or (
            str(s.checkpoint_dir) if s.checkpoint_dir else None
        )
        mat = (
            parquet_materializer(f"{staging}/neardup_work")
            if staging
            else None
        )
        edges = verified_near_dups(
            exact, "doc_id", "text",
            threshold=s.jaccard_threshold, materializer=mat,
        )
        comps = connected_components(edges, "id_a", "id_b", materializer=mat)
        losers = comps.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("doc_id")
        )
        neardup = exact.join(losers, "doc_id", "left_anti")
        neardup = self._stage(neardup, "stage2_neardup")
        n_neardup = neardup.count()

        # stage 3: benchmark decontamination (8-gram overlap, bench side
        # is distinct-small -> broadcast anti-join; training side never
        # shuffles)
        def grams(df: DataFrame) -> DataFrame:
            t = F.split("text", " ")
            return df.where(F.size(t) >= 8).select(
                "doc_id",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(split(text, ' ')) - 7),"
                        " i -> concat_ws(' ', slice(split(text, ' '), i, 8)))"
                    )
                ).alias("gram"),
            )

        is_bench = F.col("source").isin(s.bench_sources)
        bench_grams = (
            grams(docs.where(is_bench)).select("gram").distinct()
        )
        train = neardup.where(~is_bench)
        contaminated = (
            grams(train)
            .join(F.broadcast(bench_grams), "gram", "left_semi")
            .select("doc_id")
            .distinct()
        )
        clean = train.join(contaminated, "doc_id", "left_anti")
        clean = self._stage(clean, "stage3_clean")
        n_clean = clean.count()

        # stage 4: deterministic shuffle-shard write (Knuth multiplicative
        # key -> shard; partition-parallel, pruned reads per shard)
        key = knuth32(F.col("doc_id"))
        sharded = clean.withColumn(
            "shard", (key % s.n_shards).cast("long")
        )
        (
            sharded.repartition(s.n_shards, "shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .option("compression", s.compression)
            .parquet(str(s.output_directory))
        )
        return JobResponse(
            status_code=200,
            message="ok",
            data=json.dumps(
                {
                    "rows_in": n_in,
                    "rows_gated": n_gated,
                    "rows_after_neardup": n_neardup,
                    "rows_clean": n_clean,
                    "exact_dropped": n_in - n_gated,
                    "neardup_dropped": n_gated - n_neardup,
                    "contaminated_dropped": n_neardup - n_clean,
                    "n_shards": s.n_shards,
                    "seconds": round(time.time() - started, 3),
                }
            ),
        )


class AnnIndexBuildJobSettings(SparkJobSettings):
    """ANN index build: probe-set size and rerank depth knobs."""

    n_probe_queries: int = 5
    top_k: int = 5


class AnnIndexBuildJob(GenericSparkEtl[AnnIndexBuildJobSettings]):
    """Build a scalar-quantization ANN index from an embeddings table and
    validate it before publishing — the production packaging of the
    ``ann_pq_topk`` operator family (queries/llm_vectors.py).

    Pipeline (all distributed):
      1. L2-normalize and quantize each vector to integer micros;
      2. per-dimension corpus min/max bounds (128 map-side-combining
         aggregations) written as a 1-row parquet sidecar;
      3. 4-bit codes packed 16-per-BIGINT into 4 words — 32 bytes/vector
         of index state — written as the parquet code table;
      4. validation: re-read the published index, run the ADC scan +
         exact rerank for a deterministic probe set, and compute
         recall@k against exact brute-force cosine. The job FAILS
         (status 500) if recall drops below 0.6 — an index that cannot
         find true neighbors must never be published.

    ``JobResponse.data`` reports vectors indexed, code-table bytes, and
    the measured recall — the go/no-go numbers an embedding-store deploy
    gates on."""

    def run_job(self) -> JobResponse:
        from pyspark.sql import Window

        started = time.time()
        s = self.job_settings
        out = str(s.output_directory)
        em = self.spark.read.parquet(str(s.input_source)).select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
                "emb"
            ),
        )
        norm = F.sqrt(
            F.expr(
                "aggregate(zip_with(emb, emb, (x, y) -> x * y), 0.0D,"
                " (acc, x) -> acc + x)"
            )
        )
        base = em.select("vec_id", "emb", norm.alias("nrm")).withColumn(
            "v",
            F.expr("transform(emb, x -> CAST(round(x / nrm * 1e6) AS BIGINT))"),
        )
        dims = 64
        bounds = base.agg(
            *[F.min(F.element_at("v", d + 1)).alias(f"mn{d}") for d in range(dims)],
            *[F.max(F.element_at("v", d + 1)).alias(f"mx{d}") for d in range(dims)],
        ).select(
            F.array(*[F.col(f"mn{d}") for d in range(dims)]).alias("mn"),
            F.array(*[F.col(f"mx{d}") for d in range(dims)]).alias("mx"),
        )
        bounds.write.mode("overwrite").parquet(f"{out}/bounds")
        b = self.spark.read.parquet(f"{out}/bounds")
        words = (
            "transform(sequence(0, 3), wd -> "
            " aggregate(sequence(wd * 16, wd * 16 + 15), 0L, (acc, d) ->"
            "  acc + shiftleft(least(15,"
            "   ((element_at(v, CAST(d + 1 AS INT))"
            "     - element_at(mn, CAST(d + 1 AS INT))) * 16)"
            "   DIV (element_at(mx, CAST(d + 1 AS INT))"
            "        - element_at(mn, CAST(d + 1 AS INT)) + 1)),"
            "  CAST(4 * (d % 16) AS INT))))"
        )
        codes = base.transform(attach_broadcast, F.broadcast(b)).select(
            "vec_id", F.expr(words).alias("w")
        )
        codes.write.mode("overwrite").option(
            "compression", s.compression
        ).parquet(f"{out}/codes")

        # validation: query the PUBLISHED index (re-read from disk)
        idx = self.spark.read.parquet(f"{out}/codes")
        n_vectors = idx.count()
        queries = base.where(F.col("vec_id") < s.n_probe_queries).select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
            F.col("v").alias("qv"),
        )
        recon = (
            "(element_at(mn, CAST(d + 1 AS INT)) +"
            " ((2 * (shiftright(element_at(w, CAST(d DIV 16 + 1 AS INT)),"
            "        CAST(4 * (d % 16) AS INT)) & 15) + 1)"
            "  * (element_at(mx, CAST(d + 1 AS INT))"
            "     - element_at(mn, CAST(d + 1 AS INT)) + 1)) DIV 32)"
        )
        adc = (
            "aggregate(sequence(0, 63), 0L, (acc, d) -> acc + "
            f" (element_at(qv, CAST(d + 1 AS INT)) - {recon})"
            f" * (element_at(qv, CAST(d + 1 AS INT)) - {recon}))"
        )
        scored = (
            idx.transform(attach_broadcast, F.broadcast(b))
            .join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
            .withColumn("adc_dist", F.expr(adc))
        )
        w_adc = Window.partitionBy("query_id").orderBy(
            F.col("adc_dist").asc(), F.col("vec_id").asc()
        )
        cands = scored.withColumn(
            "adc_rank", F.row_number().over(w_adc)
        ).where(F.col("adc_rank") <= 3 * s.top_k)
        # exact rerank joins the original vectors back by id
        vecs = base.select("vec_id", F.col("emb").alias("c_emb"), F.col("nrm").alias("c_nrm"))
        dot = F.expr(
            "aggregate(zip_with(c_emb, q_emb, (x, y) -> x * y), 0.0D,"
            " (acc, x) -> acc + x)"
        )
        w_cos = Window.partitionBy("query_id").orderBy(
            F.col("cos_r9").desc(), F.col("vec_id").asc()
        )
        approx = (
            cands.join(vecs, "vec_id")
            .withColumn(
                "cos_r9", F.round(dot / (F.col("c_nrm") * F.col("q_nrm")), 9)
            )
            .withColumn("rank", F.row_number().over(w_cos))
            .where(F.col("rank") <= s.top_k)
            .select("query_id", "vec_id")
        )
        # exact brute-force ground truth on the raw vectors
        exact_scored = vecs.join(
            F.broadcast(queries), F.col("vec_id") != F.col("query_id")
        ).withColumn(
            "cos_r9", F.round(dot / (F.col("c_nrm") * F.col("q_nrm")), 9)
        )
        exact = (
            exact_scored.withColumn("rank", F.row_number().over(w_cos))
            .where(F.col("rank") <= s.top_k)
            .select(
                F.col("query_id").alias("eq"), F.col("vec_id").alias("ev")
            )
        )
        hits = approx.join(
            exact,
            (F.col("query_id") == F.col("eq")) & (F.col("vec_id") == F.col("ev")),
            "left_semi",
        ).count()
        # denominator = the ACTUAL exact ground-truth pair count, not
        # n_probe_queries * top_k: on a sparse / non-zero-based vec_id
        # domain (or a corpus smaller than top_k+1) the assumed product
        # overstates the attainable hits and a perfect index would
        # spuriously fail validation
        total = exact.count()
        if total == 0:
            return JobResponse(
                status_code=500,
                message="index validation failed: empty probe ground"
                " truth (no probe query ids present in the corpus)",
                data=json.dumps({"n_vectors": int(n_vectors)}),
            )
        recall = hits / total
        payload = {
            "n_vectors": int(n_vectors),
            "code_bytes_per_vector": 32,
            "recall_at_k": round(recall, 4),
            "k": s.top_k,
            "seconds": round(time.time() - started, 3),
        }
        if recall < 0.6:
            return JobResponse(
                status_code=500,
                message=f"index validation failed: recall {recall:.2f} < 0.6",
                data=json.dumps(payload),
            )
        return JobResponse(
            status_code=200, message="ok", data=json.dumps(payload)
        )


class StreamingIngestJobSettings(SparkJobSettings):
    """Settings for the incremental streaming ingest: event-time window
    width and watermark (late-data tolerance)."""

    window: str = "10 minutes"
    watermark_delay: str = "1 hour"


class StreamingIngestJob(GenericSparkEtl[StreamingIngestJobSettings]):
    """Incremental streaming ingest (Trigger.AvailableNow — the modern
    production pattern for periodic pipelines): drain whatever NEW event
    files appeared since the last run, roll them into watermark-finalized
    per-type tumbling-window aggregates, and append to a parquet sink
    exactly once. The checkpoint (``checkpoint_dir`` knob) carries source
    offsets AND window state across invocations, so re-running the job is
    an incremental batch, not a recompute — windows still inside the
    watermark stay in state and finalize on a later run. Pairs with the
    ``streaming_state_store='rocksdb'`` knob for heap-free state.

    Scale: the aggregation is the same partial+final hash-agg shape as the
    batch twin (queries/streaming_batch.q_stream_tumbling); state size is
    bounded by (open windows × types), not stream length."""

    def run_job(self) -> JobResponse:
        import os
        import tempfile

        from aind_data_transformation_spark.io.sources import (
            normalize_event_ts,
        )
        from aind_data_transformation_spark.session import (
            apply_runtime_confs,
        )

        started = time.time()
        s = self.spark
        st = self.job_settings
        apply_runtime_confs(s)
        # production shape: input_source is a DIRECTORY of event parquet
        # files that grows between invocations; schema from the footer
        src_dir = str(st.input_source)
        schema = s.read.parquet(src_dir).schema
        events = normalize_event_ts(
            s.readStream.schema(schema).parquet(src_dir)
        )
        agg = (
            events.withWatermark("ts", st.watermark_delay)
            .groupBy(F.window("ts", st.window), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                (
                    F.sum(
                        F.round(F.col("value") * 100).cast("long")
                    ).cast("double")
                    / F.lit(100.0)
                ).alias("sum_value"),
            )
            .select(
                F.col("window.start").alias("win_start"),
                F.col("window.end").alias("win_end"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )
        out = str(st.output_directory)
        ckpt = str(
            st.checkpoint_dir
            or os.path.join(
                tempfile.mkdtemp(prefix="spark_graft_ingest_"), "ckpt"
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_rows = s.read.parquet(out).count() if os.path.isdir(out) else 0
        return JobResponse(
            status_code=200,
            message="ok",
            data=json.dumps(
                {
                    "sink_rows_total": int(n_rows),
                    "checkpoint": ckpt,
                    "seconds": round(time.time() - started, 3),
                }
            ),
        )
