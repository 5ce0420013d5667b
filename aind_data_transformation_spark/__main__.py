"""CLI job runner: the executable form of the reference's lifecycle
(reference core.py:15-47 parser -> settings -> run_job -> JobResponse),
driving the Spark jobs in ``jobs.py``.

All three reference entry points work unchanged:
  EP1  python -m aind_data_transformation_spark format_conversion \\
           -j '{"input_source": "/in", "output_directory": "/out"}'
  EP2  python -m aind_data_transformation_spark compaction -c cfg.json
  EP3  TRANSFORMATION_JOB_INPUT_SOURCE=/in \\
       TRANSFORMATION_JOB_OUTPUT_DIRECTORY=/out \\
           python -m aind_data_transformation_spark corpus_clean

The response JSON is printed to stdout; the process exit code mirrors
``JobResponse.status_code`` (0 on 2xx, 1 otherwise).
"""

from __future__ import annotations

import json
import sys

from aind_data_transformation_spark.core import get_parser
from aind_data_transformation_spark.jobs import (
    AnnIndexBuildJob,
    AnnIndexBuildJobSettings,
    CompactionJob,
    CompactionJobSettings,
    CorpusCleanJob,
    CorpusCleanJobSettings,
    FormatConversionJob,
    FormatConversionJobSettings,
    NearDupResolveJob,
    NearDupResolveJobSettings,
    StreamingIngestJob,
    StreamingIngestJobSettings,
    TrainingCorpusPipelineJob,
    TrainingCorpusPipelineJobSettings,
)
from aind_data_transformation_spark.session import build_session

JOBS = {
    "format_conversion": (FormatConversionJob, FormatConversionJobSettings),
    "compaction": (CompactionJob, CompactionJobSettings),
    "corpus_clean": (CorpusCleanJob, CorpusCleanJobSettings),
    "near_dup_resolve": (NearDupResolveJob, NearDupResolveJobSettings),
    "training_corpus_pipeline": (
        TrainingCorpusPipelineJob,
        TrainingCorpusPipelineJobSettings,
    ),
    "ann_index_build": (AnnIndexBuildJob, AnnIndexBuildJobSettings),
    "streaming_ingest": (StreamingIngestJob, StreamingIngestJobSettings),
}


def main(argv: list | None = None, spark=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in JOBS:
        sys.stderr.write(
            f"usage: python -m aind_data_transformation_spark "
            f"{{{','.join(JOBS)}}} [-j JSON | -c FILE]\n"
        )
        return 2
    job_cls, settings_cls = JOBS[argv[0]]
    args = get_parser().parse_args(argv[1:])
    if args.job_settings:
        settings = settings_cls.model_validate_json(args.job_settings)
    elif args.config_file:
        settings = settings_cls.from_config_file(args.config_file)
    else:
        settings = settings_cls()  # TRANSFORMATION_JOB_* env vars
    owns_session = spark is None
    if owns_session:
        spark = build_session(app_name=f"job-{argv[0]}")
    try:
        resp = job_cls(settings, spark=spark).run_job()
    finally:
        if owns_session:
            spark.stop()
    print(resp.model_dump_json())
    return 0 if 200 <= resp.status_code < 300 else 1


if __name__ == "__main__":
    sys.exit(main())
