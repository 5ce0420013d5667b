"""Unit tests for the graph/layout library operators: connected
components (iterative min-label propagation) and scalable sequence
packing (two-phase cumulative sum)."""

from __future__ import annotations

from aind_data_transformation_spark.ops import connected_components, pack_sequences


def test_connected_components_chain_and_island(spark):
    # chain 1-2-3-4 needs >1 propagation round; 10-11 is a separate pair
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["s", "d"]
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "s", "d").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    n = 40  # diameter >> a single round; exercises the iteration loop
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["s", "d"]
    )
    got = connected_components(edges, "s", "d", max_iters=50).collect()
    assert all(r["component"] == 0 for r in got)
    assert len(got) == n + 1


def test_connected_components_raises_on_round_exhaustion(spark):
    """A diameter larger than max_iters must FAIL, not silently return
    partial labels (r6 advice): a 12-hop chain at max_iters=3 still has
    pending label changes when the budget runs out."""
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["s", "d"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, "s", "d", max_iters=3)


def test_pack_sequences_matches_bruteforce(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "n"])
    # coarse smaller than the table so multiple groups + offsets kick in
    got = {
        r["id"]: (r["cum_before"], r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, "id", "n", budget=20, coarse=16).collect()
    }
    cum = 0
    for i, n in rows:
        assert got[i] == (cum, cum // 20, cum % 20), i
        cum += n
    assert len(got) == len(rows)
