"""Time-series operators over the ``events`` table: gap filling with
forward fill (the hypertable-rollup companion every monitoring pipeline
needs) and a banded event-time range join (interval join as an equi-join).

Determinism: ``value`` aggregates use the integer-cents scheme
(numeric.py); timestamps are the µs-normalized ``events.ts``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aind_data_transformation_spark.io.sources import load_table


def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily rollup with gap filling + forward fill: build each
    user's full day grid from their first to last event (sequence +
    explode — no driver loop, no cross join against a calendar table),
    left-join the real daily totals, and carry the last observed total
    forward across silent days.

    Distributed shape: the rollup is one groupBy shuffle; the grid
    explode is embarrassingly parallel per user; the forward fill is a
    linear ``last(ignorenulls)`` window scan inside the same user
    partitioning — three narrow stages, no global sort. At 100 TB the
    grid size is bounded by users × days, orders of magnitude below the
    event count."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("day_cents"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .withColumn("filled_cents", F.last("day_cents", ignorenulls=True).over(w))
        .select("user_id", "day", "day_cents", "filled_cents")
    )


def q_join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join, banded: for every click, how many events
    the same user produced in the following hour. The naive form is a
    non-equi join (``b.ts > a.ts AND b.ts <= a.ts + 1h``) — a nested-loop
    disaster at scale. Banding by hour bucket turns it into an equi-join
    on (user_id, bucket) probed at bucket k and k+1 (every interval of
    length <= 1h spans at most two hour buckets), with the exact range
    predicate applied only inside matching buckets. Two hash-join probes,
    zero cartesian anywhere in the plan."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.expr("unix_timestamp(ts) div 3600")
    clicks = e.where(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("ts_a"), bucket.alias("bk")
    )
    right = e.select(
        "user_id", F.col("ts").alias("ts_b"), bucket.alias("bk_b")
    )
    probes = clicks.select(
        "event_id",
        "user_id",
        "ts_a",
        F.explode(F.array(F.col("bk"), F.col("bk") + 1)).alias("bk_b"),
    )
    matched = (
        probes.join(right, ["user_id", "bk_b"])
        .where(
            (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_next_hour"))
    )
    return (
        clicks.select("event_id")
        .join(matched, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_next_hour", F.lit(0)).alias("n_next_hour"),
        )
    )


def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across silent days — the numeric upgrade of
    :func:`q_ts_gapfill`'s forward fill. Same per-user day grid (so the
    first and last grid rows are always observed), then each gap row
    takes prev + (next - prev) * elapsed/gap_len from the nearest
    observed days on either side (ignore-nulls running last/first over
    the same user partitioning — two linear window scans, no self-join,
    no per-row subqueries). All inputs are exact integers (cents, day
    counts) cast to double, and the formula is the same +,-,*,/ tree in
    both engines, so IEEE-754 makes the result bit-identical to the
    DuckDB oracle."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("day_cents"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias(
            "day"
        ),
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("day_cents").isNotNull(), F.col("day"))
    joined = (
        grid.join(daily, ["user_id", "day"], "left")
        .withColumn("prev_cents", F.last("day_cents", ignorenulls=True).over(w_back))
        .withColumn("prev_day", F.last(obs_day, ignorenulls=True).over(w_back))
        .withColumn("next_cents", F.first("day_cents", ignorenulls=True).over(w_fwd))
        .withColumn("next_day", F.first(obs_day, ignorenulls=True).over(w_fwd))
    )
    interp = F.when(
        F.col("day_cents").isNotNull(), F.col("day_cents").cast("double")
    ).otherwise(
        F.col("prev_cents").cast("double")
        + (F.col("next_cents") - F.col("prev_cents")).cast("double")
        * (
            F.datediff("day", "prev_day").cast("double")
            / F.datediff("next_day", "prev_day").cast("double")
        )
    )
    return joined.select(
        "user_id", "day", "day_cents", interp.alias("interp_cents")
    )


def q_ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: events roll up to
    minutely partials, hourly from the minutely layer, daily from the
    hourly layer — each layer computed ONLY from the one below, never
    from raw events. This works because the aggregates are mergeable
    (sum/count/min/max compose associatively), which is exactly what a
    materialized rollup hierarchy exploits at 100 TB: the daily job reads
    the hourly table (~5 orders of magnitude smaller than raw), and
    backfills touch one layer. The oracle computes daily straight from
    raw events — the cascade must be indistinguishable, proving the
    merge algebra is lossless."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    minutely = e.groupBy(
        F.date_trunc("minute", "ts").alias("m"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("cents"),
        F.min(cents).alias("min_c"),
        F.max(cents).alias("max_c"),
    )
    hourly = minutely.groupBy(
        F.date_trunc("hour", "m").alias("h"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("cents").alias("cents"),
        F.min("min_c").alias("min_c"),
        F.max("max_c").alias("max_c"),
    )
    return (
        hourly.groupBy(F.date_trunc("day", "h").alias("day"), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("cents").alias("total_cents"),
            F.min("min_c").alias("min_cents"),
            F.max("max_c").alias("max_cents"),
            F.count(F.lit(1)).alias("n_hours"),
        )
    )


QUERIES = {
    "ts_gapfill": q_ts_gapfill,
    "ts_interpolate": q_ts_interpolate,
    "ts_rollup_cascade": q_ts_rollup_cascade,
    "join_range_banded": q_join_range_banded,
}

ORACLES = {
    "ts_rollup_cascade": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                   AS total_cents,
               MIN(CAST(round(value*100) AS BIGINT)) AS min_cents,
               MAX(CAST(round(value*100) AS BIGINT)) AS max_cents,
               COUNT(DISTINCT date_trunc('hour', ts)) AS n_hours
        FROM events
        GROUP BY date_trunc('day', ts), event_type
    """,
    "ts_interpolate": """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                       AS day_cents
            FROM events GROUP BY user_id, date_trunc('day', ts)
        ), span AS (
            SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
            FROM daily GROUP BY user_id
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span
        ), ctx AS (
            SELECT g.user_id, g.day, d.day_cents,
                   LAST_VALUE(d.day_cents IGNORE NULLS) OVER w_back AS prev_cents,
                   LAST_VALUE(CASE WHEN d.day_cents IS NOT NULL THEN g.day END
                              IGNORE NULLS) OVER w_back AS prev_day,
                   FIRST_VALUE(d.day_cents IGNORE NULLS) OVER w_fwd AS next_cents,
                   FIRST_VALUE(CASE WHEN d.day_cents IS NOT NULL THEN g.day END
                               IGNORE NULLS) OVER w_fwd AS next_day
            FROM grid g
            LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
            WINDOW w_back AS (
                PARTITION BY g.user_id ORDER BY g.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ), w_fwd AS (
                PARTITION BY g.user_id ORDER BY g.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
            )
        )
        SELECT user_id, day, day_cents,
               CASE WHEN day_cents IS NOT NULL THEN CAST(day_cents AS DOUBLE)
                    ELSE CAST(prev_cents AS DOUBLE)
                         + CAST(next_cents - prev_cents AS DOUBLE)
                           * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                              / CAST(date_diff('day', prev_day, next_day) AS DOUBLE))
               END AS interp_cents
        FROM ctx
    """,
    "ts_gapfill": """
        WITH daily AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                       AS day_cents
            FROM events GROUP BY user_id, date_trunc('day', ts)
        ), span AS (
            SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
            FROM daily GROUP BY user_id
        ), grid AS (
            SELECT user_id,
                   unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
            FROM span
        )
        SELECT g.user_id, g.day, d.day_cents,
               LAST_VALUE(d.day_cents IGNORE NULLS) OVER (
                   PARTITION BY g.user_id ORDER BY g.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_cents
        FROM grid g
        LEFT JOIN daily d ON d.user_id = g.user_id AND d.day = g.day
    """,
    "join_range_banded": """
        SELECT a.event_id,
               COUNT(b.event_id) AS n_next_hour
        FROM events a
        LEFT JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 1 HOUR
        WHERE a.event_type = 'click'
        GROUP BY a.event_id
    """,
}
