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
    connected_components,
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

        mat = (
            parquet_materializer(s.materialize_dir)
            if s.materialize_dir
            else None
        )
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
