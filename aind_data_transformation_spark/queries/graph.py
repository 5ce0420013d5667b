"""Iterative graph analytics on Spark DataFrames.

PageRank is the canonical "loop until fixpoint" algorithm a declarative
engine supposedly can't express — here it's a driver-side loop of
join+groupBy rounds, each materialized (persist + count) so the lineage
stays one round deep. Connected components (ops.connected_components,
exercised by ``dedup_clusters``) follows the same pattern.

Determinism contract: ranks are fixed-point int64 (SCALE = 1e12), all
updates are integer multiply/floor-divide/sum. Integer addition is
associative+commutative, so partial aggregation order — which Spark does
NOT guarantee — cannot change the result, and the DuckDB oracle (the same
rounds unrolled as chained CTEs, generated from the same Python loop)
matches bit-for-bit. A float PageRank could never hash-match across
engines.

Scale notes (100 TB): each round is one shuffle of the edge list joined
against the current rank vector — the same shape GraphX/Pregel lowers to.
Ranks persist in MEMORY_AND_DISK between rounds; at real scale you
``localCheckpoint`` every ~5 rounds to truncate lineage, and pre-partition
edges by src so every round reuses the partitioning (zero-shuffle join
against the co-partitioned rank vector).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from aind_data_transformation_spark.io.sources import load_table

SCALE = 1_000_000_000_000
ROUNDS = 8
DAMP_NUM, DAMP_DEN = 85, 100


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite user<->event_type interaction graph from ``events``,
    symmetrized (both directions) so every node has in- and out-edges —
    no dangling-mass correction needed."""
    e = load_table(spark, sf_dir, "events")
    pairs = e.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("t:"), F.col("event_type")).alias("t"),
    ).distinct()
    return pairs.select(F.col("u").alias("src"), F.col("t").alias("dst")).unionByName(
        pairs.select(F.col("t").alias("src"), F.col("u").alias("dst"))
    )


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point integer PageRank, ROUNDS rounds, damping 0.85.

    rank0 = SCALE // N for every node; each round every node sends
    rank // out_degree along its out-edges and receives
    base + (85 * incoming_sum) // 100, with base = (15 * (SCALE//N)) // 100.
    Symmetrized edges mean every node receives mail every round, so the
    per-round frame is exactly (node, rank) for all N nodes."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = edges.join(deg, "src").persist()
    n_nodes = deg.count()  # also materializes edges_deg's input
    r0 = SCALE // n_nodes
    base = (15 * r0) // DAMP_DEN
    ranks = deg.select(F.col("src").alias("node"), F.lit(r0).alias("rank"))
    for _ in range(ROUNDS):
        contribs = edges_deg.join(
            ranks, edges_deg.src == ranks.node, "inner"
        ).select("dst", F.expr("rank DIV deg").alias("contrib"))
        new_ranks = (
            contribs.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("contrib").alias("mail"))
            .select(
                "node",
                F.expr(
                    f"{base}L + ({DAMP_NUM} * mail) DIV {DAMP_DEN}"
                ).alias("rank"),
            )
            .persist()
        )
        new_ranks.count()  # materialize: keeps lineage one round deep
        ranks.unpersist()  # no-op on the unpersisted round-0 frame
        ranks = new_ranks
    edges_deg.unpersist()
    return ranks


def _pagerank_oracle() -> str:
    """The same rounds unrolled as chained CTEs (no vendor recursion
    quirks), generated from the same constants."""
    head = f"""
        WITH pairs AS (
            SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS u,
                            't:' || event_type AS t
            FROM events
        ), edges AS (
            SELECT u AS src, t AS dst FROM pairs
            UNION ALL
            SELECT t AS src, u AS dst FROM pairs
        ), deg AS (
            SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
        ), consts AS (
            SELECT {SCALE} // COUNT(*) AS r0,
                   (15 * ({SCALE} // COUNT(*))) // {DAMP_DEN} AS base
            FROM deg
        ), r0 AS (
            SELECT src AS node, (SELECT r0 FROM consts) AS rank FROM deg
        )"""
    rounds = []
    for k in range(1, ROUNDS + 1):
        rounds.append(
            f""", r{k} AS (
            SELECT e.dst AS node,
                   (SELECT base FROM consts)
                     + ({DAMP_NUM} * SUM(r.rank // d.deg)) // {DAMP_DEN} AS rank
            FROM edges e
            JOIN r{k - 1} r ON e.src = r.node
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        )"""
        )
    return (
        head
        + "".join(rounds)
        + f"\n        SELECT node, CAST(rank AS BIGINT) AS rank FROM r{ROUNDS}"
    )


QUERIES = {
    "graph_pagerank": q_graph_pagerank,
}

ORACLES = {
    "graph_pagerank": _pagerank_oracle(),
}
