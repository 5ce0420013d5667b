"""Framework-layer tests: capability parity with the reference's test suite
(reference tests/test_core.py:19-102 — settings from kwargs / CLI JSON
string / config file / env vars, path coercion, run_job response)."""

from __future__ import annotations

import json
import os
from pathlib import Path
from unittest.mock import patch

from aind_data_transformation_spark.core import (
    GenericSparkEtl,
    JobResponse,
    SparkJobSettings,
    get_parser,
)

RESOURCES = Path(__file__).parent / "resources"


class ExampleJobSettings(SparkJobSettings):
    param: int = 1


class ExampleJob(GenericSparkEtl[ExampleJobSettings]):
    def run_job(self) -> JobResponse:
        return JobResponse(status_code=200, message=f"param={self.job_settings.param}")


def make_settings(**kw) -> ExampleJobSettings:
    base = {"input_source": "in_dir", "output_directory": "out_dir"}
    base.update(kw)
    return ExampleJobSettings(**base)


def test_path_coercion_str_to_path():
    job = ExampleJob(make_settings())
    assert job.job_settings.input_source == Path("in_dir")
    assert job.job_settings.output_directory == Path("out_dir")


def test_path_coercion_keeps_uris():
    job = ExampleJob(
        make_settings(
            input_source="s3a://bucket/in", output_directory="hdfs://nn/out"
        )
    )
    assert job.job_settings.input_source == "s3a://bucket/in"
    assert job.job_settings.output_directory == "hdfs://nn/out"


def test_settings_deep_copied():
    settings = make_settings(partition_by=["a"])
    job = ExampleJob(settings)
    settings.partition_by.append("b")
    assert job.job_settings.partition_by == ["a"]


def test_cli_json_string_round_trip():
    settings = make_settings(param=3)
    args = get_parser().parse_args(["-j", settings.model_dump_json()])
    loaded = ExampleJobSettings.from_parsed_args(args)
    assert loaded == settings


def test_cli_config_file():
    args = get_parser().parse_args(["-c", str(RESOURCES / "settings.json")])
    loaded = ExampleJobSettings.from_parsed_args(args)
    assert loaded.param == 2
    assert str(loaded.input_source) == "some_input_dir"


def test_from_config_file_directly():
    loaded = ExampleJobSettings.from_config_file(RESOURCES / "settings.json")
    expected = json.loads((RESOURCES / "settings.json").read_text())
    assert loaded.param == expected["param"]


def test_env_var_loading():
    env = {
        "TRANSFORMATION_JOB_INPUT_SOURCE": "env_in",
        "TRANSFORMATION_JOB_OUTPUT_DIRECTORY": "env_out",
        "TRANSFORMATION_JOB_PARAM": "7",
    }
    with patch.dict(os.environ, env):
        loaded = ExampleJobSettings.from_parsed_args(get_parser().parse_args([]))
    assert loaded.param == 7
    assert str(loaded.input_source) == "env_in"


def test_run_job_response_contract():
    resp = ExampleJob(make_settings(param=5)).run_job()
    assert resp == JobResponse(status_code=200, message="param=5", data=None)


def test_job_response_forbids_extras():
    import pytest

    with pytest.raises(Exception):
        JobResponse(status_code=200, unexpected="x")


def test_cli_main_runs_job_from_json_string(spark, tmp_path, capsys):
    """EP1 end-to-end: job name + -j JSON string -> JobResponse on
    stdout, exit code 0."""
    import json as _json

    from aind_data_transformation_spark.__main__ import main

    from tests.conftest import TEST_SF_DIR

    out = tmp_path / "cli_out"
    code = main(
        [
            "format_conversion",
            "-j",
            _json.dumps(
                {
                    "input_source": f"{TEST_SF_DIR}/region.parquet",
                    "output_directory": str(out),
                    "output_format": "json",
                }
            ),
        ],
        spark=spark,
    )
    assert code == 0
    resp = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resp["status_code"] == 200
    assert _json.loads(resp["data"])["rows_written"] == 5


def test_cli_main_env_var_entrypoint(spark, tmp_path, capsys, monkeypatch):
    """EP3: zero-arg settings from TRANSFORMATION_JOB_* env vars."""
    import json as _json

    from aind_data_transformation_spark.__main__ import main

    from tests.conftest import TEST_SF_DIR

    out = tmp_path / "cli_env_out"
    monkeypatch.setenv(
        "TRANSFORMATION_JOB_INPUT_SOURCE", f"{TEST_SF_DIR}/nation.parquet"
    )
    monkeypatch.setenv("TRANSFORMATION_JOB_OUTPUT_DIRECTORY", str(out))
    code = main(["format_conversion"], spark=spark)
    assert code == 0
    resp = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resp["status_code"] == 200
    assert out.exists()


def test_cli_main_rejects_unknown_job():
    from aind_data_transformation_spark.__main__ import main

    assert main(["not_a_job"]) == 2


def test_cli_runs_ann_index_build(spark, tmp_path):
    """The CLI exposes the full job tier: ann_index_build end-to-end
    through the reference's EP1 (JSON-string) entry point."""
    import json as _json

    from tests.conftest import TEST_SF_DIR

    from aind_data_transformation_spark.__main__ import main

    out = tmp_path / "idx"
    code = main(
        [
            "ann_index_build",
            "-j",
            _json.dumps(
                {
                    "input_source": f"{TEST_SF_DIR}/embeddings.parquet",
                    "output_directory": str(out),
                }
            ),
        ],
        spark=spark,
    )
    assert code == 0
    assert (out / "codes").exists() and (out / "bounds").exists()


def test_cli_runs_streaming_ingest(spark, tmp_path, capsys):
    """The streaming job tier through the reference's EP1 entry point:
    `streaming_ingest` with a JSON-string config drains the source via
    AvailableNow and reports sink totals in JobResponse.data."""
    import json as _json

    from tests.conftest import TEST_SF_DIR

    from aind_data_transformation_spark.__main__ import main

    src = tmp_path / "src"
    out = tmp_path / "out"
    spark.read.parquet(f"{TEST_SF_DIR}/events.parquet").limit(
        200
    ).coalesce(1).write.parquet(str(src))
    code = main(
        [
            "streaming_ingest",
            "-j",
            _json.dumps(
                {
                    "input_source": str(src),
                    "output_directory": str(out),
                    "checkpoint_dir": str(tmp_path / "ckpt"),
                }
            ),
        ],
        spark=spark,
    )
    assert code == 0
    resp = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resp["status_code"] == 200
    assert _json.loads(resp["data"])["sink_rows_total"] >= 0
    assert out.exists()
