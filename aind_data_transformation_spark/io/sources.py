"""Table sources.

The driver's synthetic tables (TESTDATA.md / FIXTURES.md) are one parquet
file per table under an ``sf_dir``. All loads go through :func:`load_table`
so the two schema quirks are handled in exactly one place:

* ``events.ts`` has shipped as either parquet INT64 TIMESTAMP(NANOS) or
  TIMESTAMP(MICROS) across driver testdata regenerations; both are
  normalized to a microsecond ``TimestampType`` by :func:`normalize_event_ts`.
  For the NANOS form Spark's vectorized reader rejects the type, so we read
  it as a raw long (``spark.sql.legacy.parquet.nanosAsLong``) and derive µs
  via integer division (``ts DIV 1000`` — floor/truncation, which is exactly
  how the DuckDB oracle's ns->us view conversion behaves). Never divide the
  raw long by 1000.0: epoch-nanos ~1.7e18 exceeds double's 53-bit mantissa
  and float division silently corrupts microseconds.
* every other timestamp column is parquet TIMESTAMP(MILLIS, isAdjustedToUTC
  =false) and arrives as ``TimestampNTZType`` — time-zone free, matching
  DuckDB's naive TIMESTAMP.

At 100 TB these reads stay scan-friendly: plain ``spark.read.parquet`` keeps
Catalyst's column pruning / predicate pushdown / partition pruning intact
(the ``withColumn`` on events is a projection on top of the scan and does
not block pushdown of filters on other columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aind_data_transformation_spark.session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; normalizes ``events.ts`` to microsecond
    timestamps (see module docstring)."""
    apply_runtime_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a microsecond UTC ``TimestampType``
    regardless of how the generator wrote it: INT64 TIMESTAMP(NANOS) parquet
    arrives as a raw long (via ``nanosAsLong``) and is floor-divided to µs;
    TIMESTAMP(MICROS) parquet arrives as TIMESTAMP_NTZ and is cast —
    value-preserving because every engine session pins
    ``spark.sql.session.timeZone=UTC`` (session.py RUNTIME_CONFS)."""
    dtype = dict(df.dtypes).get("ts")
    if dtype in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    suffix: str = "",
    tables: tuple[str, ...] | None = None,
) -> None:
    """Register driver tables as temp views (``name + suffix``) so
    pipelines can run against the pure SQL surface (``spark.sql``) with the
    same normalized schemas as :func:`load_table`. Pass ``tables`` to
    register only what the query reads — each registration is a parquet
    footer/schema round-trip, so registering all 10 tables costs ~3 s of
    pure driver overhead that a single-table query should not pay."""
    for name in tables if tables is not None else TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(f"{name}{suffix}")


def read_csv(spark: SparkSession, path: str, schema, **options) -> DataFrame:
    """CSV ingestion with an explicit StructType (schema inference is a
    full extra pass over the data — never acceptable at 100 TB)."""
    apply_runtime_confs(spark)
    reader = spark.read.schema(schema).option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema, **options) -> DataFrame:
    """JSON-lines ingestion with an explicit StructType."""
    apply_runtime_confs(spark)
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)
