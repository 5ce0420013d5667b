"""Multi-writer stress: the put-if-absent commit protocol under REAL
process-level concurrency (separate interpreters — the deployment shape
of N independent Spark drivers sharing one table on an object store),
plus serializability of racing semantic mutators.

The thread-level races live in tests/test_sinks.py
(test_txlog_ds_writer_concurrent_appends); this module removes the
shared-interpreter safety net: children share NOTHING but the
filesystem, exactly like independent cluster jobs."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

from tests.conftest import TEST_SF_DIR

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = textwrap.dedent(
    """
    import os, sys, json
    sys.path.insert(0, {repo!r})
    import pyarrow as pa
    import pyarrow.parquet as pq
    from aind_data_transformation_spark.io.txlog_source import (
        _log_rows, attempt_commit,
    )

    log_dir, data_dir, pid, n_commits = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )
    for seq in range(n_commits):
        path = os.path.join(data_dir, f"p{{pid}}-s{{seq}}.parquet")
        pq.write_table(
            pa.table({{
                "pid": pa.array([pid] * 5, pa.int64()),
                "seq": pa.array([seq] * 5, pa.int64()),
                "val": pa.array(list(range(5)), pa.int64()),
            }}),
            path,
        )
        # optimistic loop: ONE snapshot feeds the version claim; a
        # lost race re-snapshots (same invariant as every engine
        # mutator). No backoff on purpose — maximal contention.
        for _ in range(2000):
            rows = _log_rows(log_dir)
            version = max(
                (r.get("commit", 0) for r in rows), default=-1
            ) + 1
            if attempt_commit(
                log_dir, version,
                [{{"commit": version, "action": "add", "path": path}}],
                op=f"APPEND-p{{pid}}", rows=rows,
            ):
                break
        else:
            raise SystemExit(f"p{{pid}} seq {{seq}}: retries exhausted")
    print("done", pid)
    """
)


def test_multiprocess_appenders_no_lost_commits(tmp_path, spark):
    """8 interpreter processes x 6 commits each against ONE table, no
    coordination beyond O_CREAT|O_EXCL on the version file. Every
    commit must land: versions contiguous, every (pid, seq) add live,
    exactly one commitInfo per commit with non-decreasing timestamps,
    and the connector read serves all rows."""
    from aind_data_transformation_spark.io import txlog_source as tx

    n_procs, n_commits = 8, 6
    base = tmp_path / "mp_appends"
    log_dir, data_dir = str(base / "_log"), str(base / "data")
    os.makedirs(log_dir)
    os.makedirs(data_dir)
    child = _CHILD.format(repo=REPO)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child, log_dir, data_dir,
             str(pid), str(n_commits)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(n_procs)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-1500:]

    rows = tx._log_rows(log_dir)
    versions = sorted({r["commit"] for r in rows})
    assert versions == list(range(n_procs * n_commits)), (
        "lost or duplicated commit versions"
    )
    adds = [r for r in rows if r["action"] == "add"]
    assert len(adds) == n_procs * n_commits
    # exactly one commitInfo per version, timestamps non-decreasing in
    # version order (attempt_commit clamps against the head it saw —
    # under racing this is monotone per the winning chain)
    cis = sorted(
        (r for r in rows if r["action"] == "commitInfo"),
        key=lambda r: r["commit"],
    )
    assert len(cis) == n_procs * n_commits
    assert [c["commit"] for c in cis] == versions
    ts = [c["ts"] for c in cis]
    assert all(b >= a for a, b in zip(ts, ts[1:])), (
        "commit timestamps regressed across the winning chain"
    )
    # every (pid, seq) present exactly once, via the real connector
    tx.register(spark)
    df = spark.read.format("txlog").option("path", log_dir).load()
    got = {
        (r["pid"], r["seq"], r["n"])
        for r in df.groupBy("pid", "seq").count()
        .withColumnRenamed("count", "n").collect()
    }
    want = {
        (pid, seq, 5)
        for pid in range(n_procs)
        for seq in range(n_commits)
    }
    assert got == want


def test_merge_vs_delete_serializability(tmp_path, spark):
    """A COPY-ON-WRITE merge racing a file-removing compaction on the
    same table must end in a state equal to SOME serial order — never
    a lost update or a resurrected file. Forced interleaving: the
    merge computes its rewrite against snapshot S, then a delete
    commits FIRST touching one of the merge's files; the merge's
    commit-race path must detect the overlap and recompute (engine
    conflict check), not blind-rebase."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from aind_data_transformation_spark.io.txlog_source import (
        _live_files, _log_rows, attempt_commit,
    )
    from aind_data_transformation_spark.queries import sinks

    base = tmp_path / "merge_race"
    log_dir, data_dir = str(base / "_log"), str(base / "data")
    os.makedirs(log_dir)
    os.makedirs(data_dir)
    # two files, keys 0-4 and 5-9
    for b in range(2):
        pq.write_table(
            pa.table({
                "k": pa.array(range(b * 5, b * 5 + 5), pa.int64()),
                "v": pa.array([10] * 5, pa.int64()),
            }),
            os.path.join(data_dir, f"f{b}.parquet"),
        )
        attempt_commit(
            log_dir, b,
            [{
                "commit": b, "action": "add",
                "path": os.path.join(data_dir, f"f{b}.parquet"),
            }],
        )
    # interloper: remove f0 (the file the merge must rewrite) and
    # re-add its surviving rows as f0b — a compaction shape
    pq.write_table(
        pa.table({
            "k": pa.array(range(1, 5), pa.int64()),
            "v": pa.array([10] * 4, pa.int64()),
        }),
        os.path.join(data_dir, "f0b.parquet"),
    )

    interposed = {"done": False}
    orig = sinks._txlog_attempt_commit

    def racing_commit(log_dir_, version, actions, **kw):
        # fire the interloper exactly once, just before the merge's
        # first commit attempt — the merge's snapshot is now stale
        if not interposed["done"]:
            interposed["done"] = True
            assert orig(
                log_dir_, version,
                [
                    {"commit": version, "action": "remove",
                     "path": os.path.join(data_dir, "f0.parquet")},
                    {"commit": version, "action": "add",
                     "path": os.path.join(data_dir, "f0b.parquet")},
                ],
                op="DELETE",
            )
        return orig(log_dir_, version, actions, **kw)

    # merge: delete key 0 (lives in f0), update key 7 -> v=99
    changes = spark.createDataFrame(
        [(0, 10, "D"), (7, 99, "U")], "k long, v long, op string"
    )
    sinks.txlog_merge.__globals__["_txlog_attempt_commit"] = racing_commit
    try:
        res = sinks.txlog_merge(spark, log_dir, changes, "k")
    finally:
        sinks.txlog_merge.__globals__["_txlog_attempt_commit"] = orig
    assert res["version"] is not None
    assert interposed["done"], "interloper never fired"
    # the overlap was a REAL conflict (interloper removed a file the
    # merge planned to rewrite) — the merge must have recomputed, not
    # blind-rebased its stale rewrite
    assert res["recomputes"] >= 1, res

    rows = _log_rows(log_dir)
    live = _live_files(rows)
    final = {
        (r["k"], r["v"])
        for r in spark.read.parquet(*live).collect()
    }
    # serial order delete-then-merge: k0 removed (by BOTH — the merge
    # recomputed over f0b which no longer holds it... and the delete
    # dropped it), k7 updated, everything else intact
    want = {(k, 10) for k in range(1, 10) if k != 7} | {(7, 99)}
    assert final == want, final
    # and f0 must NOT be live (no resurrection by the merge's stale
    # rewrite plan)
    assert not any(p.endswith("f0.parquet") for p in live)


def test_append_only_survives_multiprocess_race(tmp_path):
    """The protocol gate holds under racing: with append_only set,
    concurrent processes doing appends all land, and a racing remover
    process NEVER lands regardless of interleaving."""
    import textwrap as tw

    from aind_data_transformation_spark.io.txlog_source import (
        _log_rows, attempt_commit, set_protocol,
    )

    base = tmp_path / "mp_appendonly"
    log_dir, data_dir = str(base / "_log"), str(base / "data")
    os.makedirs(log_dir)
    os.makedirs(data_dir)
    set_protocol(log_dir, 2, 2, [], ["append_only"])
    remover = tw.dedent(
        f"""
        import sys
        sys.path.insert(0, {REPO!r})
        from aind_data_transformation_spark.io.txlog_source import (
            _log_rows, attempt_commit, TxlogProtocolError,
        )
        blocked = 0
        for i in range(10):
            rows = _log_rows({log_dir!r})
            v = max((r.get("commit", 0) for r in rows), default=-1) + 1
            try:
                attempt_commit(
                    {log_dir!r}, v,
                    [{{"commit": v, "action": "remove", "path": "x"}}],
                    rows=rows,
                )
            except TxlogProtocolError:
                blocked += 1
        print(blocked)
        """
    )
    appender = _CHILD.format(repo=REPO)
    ps = [
        subprocess.Popen(
            [sys.executable, "-c", appender, log_dir, data_dir,
             str(pid), "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(3)
    ] + [
        subprocess.Popen(
            [sys.executable, "-c", remover],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
    ]
    outs = []
    for p in ps:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-1500:]
        outs.append(out.strip())
    assert outs[-1] == "10", "some remove slipped past the gate"
    rows = _log_rows(log_dir)
    assert sum(1 for r in rows if r["action"] == "remove") == 0
    assert sum(1 for r in rows if r["action"] == "add") == 12


def test_dv_delete_applies_on_file_granular_tables(tmp_path, spark):
    """Regression (r12): the mutators mapped input_file_name() to its
    parent DIRECTORY unconditionally, so on a table whose adds are
    per-FILE (the connector's stats/bloom shape) a DV's target matched
    no live path — `_txlog_live_dvs` dropped it and deleted rows came
    back. The mapping now resolves to the logged add itself."""
    from aind_data_transformation_spark.io import txlog_source as tx
    from aind_data_transformation_spark.queries import sinks
    from aind_data_transformation_spark.queries.relational import load_table

    base = str(tmp_path / "dv_filegranular")
    log_dir = os.path.join(base, "_log")
    tx.register(spark)
    nation = load_table(spark, TEST_SF_DIR, "nation")
    # stats_col => Delta-style one add PER FILE
    (
        nation.repartition(4)
        .write.format("txlog")
        .mode("append")
        .option("stats_col", "n_nationkey")
        .save(log_dir)
    )
    adds = [
        r for r in tx._log_rows(log_dir) if r.get("action") == "add"
    ]
    assert len(adds) == 4 and all(
        r["path"].endswith(".parquet") for r in adds
    ), "fixture must be file-granular"
    res = sinks.txlog_delete_with_dv(
        spark,
        log_dir,
        spark.createDataFrame(
            [(k,) for k in (0, 7, 19)], "n_nationkey long"
        ),
        "n_nationkey",
    )
    assert res["version"] is not None
    got = sorted(
        r["n_nationkey"]
        for r in sinks.txlog_read_with_dvs(
            spark, log_dir, "n_nationkey"
        ).collect()
    )
    assert got == [k for k in range(25) if k not in (0, 7, 19)], (
        "DV delete did not apply on a file-granular table"
    )


def test_upsert_classify_delete_race_degrades_to_insert(tmp_path, spark):
    """A key classified U (live) that a concurrent delete removes
    before the merge's own snapshot must still land — the unmatched
    update degrades to an insert (Delta's whenNotMatched fallback),
    never a lost row or a resurrected old image."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aind_data_transformation_spark.io.txlog_source import (
        _live_files, _log_rows, attempt_commit,
    )
    from aind_data_transformation_spark.queries import sinks

    base = tmp_path / "upsert_race"
    log_dir, data_dir = str(base / "_log"), str(base / "data")
    os.makedirs(log_dir)
    os.makedirs(data_dir)
    pq.write_table(
        pa.table({
            "k": pa.array(range(5), pa.int64()),
            "v": pa.array([1] * 5, pa.int64()),
        }),
        os.path.join(data_dir, "f0.parquet"),
    )
    attempt_commit(
        log_dir, 0,
        [{"commit": 0, "action": "add",
          "path": os.path.join(data_dir, "f0.parquet")}],
    )

    fired = {"done": False}
    orig = sinks._txlog_attempt_commit

    def racing(log_dir_, version, actions, **kw):
        if not fired["done"]:
            fired["done"] = True
            # interloper: compaction drops key 2 entirely
            pq.write_table(
                pa.table({
                    "k": pa.array([0, 1, 3, 4], pa.int64()),
                    "v": pa.array([1] * 4, pa.int64()),
                }),
                os.path.join(data_dir, "f0b.parquet"),
            )
            assert orig(
                log_dir_, version,
                [
                    {"commit": version, "action": "remove",
                     "path": os.path.join(data_dir, "f0.parquet")},
                    {"commit": version, "action": "add",
                     "path": os.path.join(data_dir, "f0b.parquet")},
                ],
                op="DELETE",
            )
        return orig(log_dir_, version, actions, **kw)

    batch = spark.createDataFrame([(2, 99), (7, 50)], "k long, v long")
    sinks.txlog_merge.__globals__["_txlog_attempt_commit"] = racing
    try:
        res = sinks.txlog_upsert(spark, log_dir, batch, "k")
    finally:
        sinks.txlog_merge.__globals__["_txlog_attempt_commit"] = orig
    # classification saw key 2 live -> U; key 7 new -> I
    assert (res["n_updated"], res["n_inserted"]) == (1, 1)
    assert fired["done"]
    final = {
        (r["k"], r["v"])
        for r in spark.read.parquet(
            *_live_files(_log_rows(log_dir))
        ).collect()
    }
    # delete-then-upsert serial order: key 2 re-lands with the NEW
    # image, key 7 inserted, others untouched
    assert final == {(0, 1), (1, 1), (3, 1), (4, 1), (2, 99), (7, 50)}, (
        final
    )
