"""aind_data_transformation_spark — a PySpark-native analytics/ETL engine.

A from-scratch engine with the capabilities of
AllenNeuralDynamics/aind-data-transformation (an abstract ETL-job framework,
reference src/aind_data_transformation/core.py:1-111), re-expressed
Spark-first and extended with the relational, LLM-data-pipeline, and
streaming operator inventory of SURVEY.md §2 Part B.

Layout:
  core.py        job-framework layer (settings / response / GenericSparkEtl)
  session.py     tuned SparkSession builder
  io/            sources (parquet/csv/json readers) and sinks (partitioned writes)
  queries/       the operator inventory: each key -> (spark, sf_dir) -> DataFrame
                 plus a DuckDB oracle SQL string for correctness checking
  streaming/     Structured Streaming wrappers of the batch twins
"""

__version__ = "0.1.0"

from aind_data_transformation_spark.core import (  # noqa: F401
    GenericSparkEtl,
    JobResponse,
    SparkJobSettings,
    get_parser,
)
