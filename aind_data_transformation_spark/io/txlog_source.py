"""A Python DataSource V2 over the transaction-log table format — the
log-backed tables the sinks tier writes (`queries/sinks.py`:
`_build_txlog_table` and every `sink_txlog_*` mutation), readable as a
first-class Spark source:

    spark.read.format("txlog").option("path", log_dir).load()
    spark.readStream.format("txlog").option("path", log_dir).load()

Batch read = log replay to the live file set, one input partition per
parquet part file, rows decoded EXECUTOR-side with pyarrow (the data
never moves through the driver — only the metadata replay does, exactly
like a JVM file source's driver-side listing).

Streaming read = the lakehouse streaming-source mechanic
(`sink_txlog_incremental_read`'s file-list algebra) as a real
`DataSourceStreamReader`: offsets are commit versions; each micro-batch
serves the files ADDED in ``(start, end]`` that are still live at
``end``, partitioned per part file. ``latestOffset`` reports the log
head, so each micro-batch consumes every commit since the last poll —
and replaying a batch re-reads exactly its version window's files
(offsets are pure log metadata, immune to later directory changes).

Reference scope: the reference framework (core.py:15-110) reads opaque
input directories; this connector is the engine-idiomatic equivalent
surface for its own table format.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _log_rows(log_dir: str) -> list:
    """Driver-side log replay input: every action line of every commit
    file (metadata-sized), via stdlib json — no Spark needed, so the
    reader classes stay picklable and executor-safe. Checkpoint-aware:
    a compacted table replays latest checkpoint parquet + JSON tail,
    matching queries/sinks._txlog_log_rows."""
    ckpts = sorted(glob.glob(os.path.join(log_dir, "_checkpoint_*")))
    rows = []
    ckpt_version = -1
    if ckpts:
        import pyarrow.parquet as pq

        latest = ckpts[-1]
        ckpt_version = int(latest.rsplit("_", 1)[-1])
        rows.extend(pq.read_table(latest).to_pylist())
    for f in sorted(glob.glob(os.path.join(log_dir, "*.json"))):
        with open(f) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    r = json.loads(line)
                    if r.get("commit", 0) > ckpt_version:
                        rows.append(r)
    return rows


def _live_files(rows: list, as_of=None) -> list:
    """Last action per path wins (remove beats add within a commit),
    matching queries/sinks._txlog_live_from_rows."""
    last: dict = {}
    for r in sorted(rows, key=lambda r: (r["commit"], r["action"] or "")):
        if as_of is not None and r["commit"] > as_of:
            continue
        if r["action"] in ("add", "remove") and r.get("path") is not None:
            last[r["path"]] = r["action"]
    return sorted(p for p, a in last.items() if a == "add")


def _incremental_files(rows: list, start: int, end: int) -> list:
    """Files ADDED in commits (start, end] that are still live at end —
    the per-batch increment of a log-tailing consumer."""
    live_at_end = set(_live_files(rows, as_of=end))
    added = {
        r["path"]
        for r in rows
        if r["action"] == "add"
        and start < r["commit"] <= end
        and r.get("path") is not None
    }
    return sorted(added & live_at_end)


def _live_dvs(rows: list, live: list) -> dict:
    """Deletion-vector applicability from pure log metadata (matching
    queries/sinks._txlog_live_dvs): sidecar -> its targets, kept only
    where a target is still live. Returned as {target data dir:
    [sidecar paths]} so each partition can resolve its own tombstones
    executor-side."""
    live_set = set(live)
    by_target: dict = {}
    for r in rows:
        if r.get("action") == "dv" and r.get("path") is not None:
            t = r.get("target")
            if t in live_set:
                by_target.setdefault(t, []).append(r["path"])
    return by_target


def _part_files(data_dirs: list) -> list:
    out = []
    for d in data_dirs:
        out.extend(
            sorted(glob.glob(os.path.join(d, "part-*.parquet")))
            or sorted(glob.glob(os.path.join(d, "part-*")))
        )
    return out


def _infer_ddl(log_dir: str) -> str:
    """Spark DDL from the first live file's parquet footer (pyarrow) —
    the same footer-driven inference a JVM parquet scan performs."""
    import pyarrow.parquet as pq

    live = _live_files(_log_rows(log_dir))
    if not live:
        raise ValueError(f"txlog table has no live files: {log_dir}")
    parts = _part_files(live[:1])
    schema = pq.read_schema(parts[0])
    m = {
        "int64": "bigint",
        "int32": "int",
        "double": "double",
        "float": "float",
        "string": "string",
        "large_string": "string",
        "bool": "boolean",
        "date32[day]": "date",
    }

    def ddl(t):
        s = str(t)
        if s in m:
            return m[s]
        if s.startswith("timestamp"):
            return "timestamp"
        if s.startswith("decimal"):
            # pyarrow prints decimal128(p, s) — not valid Spark DDL
            return f"decimal({t.precision},{t.scale})"
        raise ValueError(f"unsupported txlog column type: {s}")

    return ", ".join(f"`{f.name}` {ddl(f.type)}" for f in schema)


class _PartFilePartition(InputPartition):
    def __init__(self, path: str, data_dir: str = "", dv_paths=None):
        self.path = path
        self.data_dir = data_dir
        self.dv_paths = dv_paths or []


def _read_part(path: str, names: list, data_dir: str = "",
               dv_paths=None, dv_key: str = ""):
    """Executor-side decode of one parquet part file via pyarrow,
    yielding whole Arrow RecordBatches (the Spark 4 Python DataSource
    fast path — columnar hand-off, no per-row Python tuples). When the
    file has live deletion vectors, their keys are anti-filtered HERE,
    still columnar (pyarrow compute is_in): merge-on-read tables read
    through the connector see exactly what the engine's DV-aware replay
    sees, never resurrected rows."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if not (dv_paths and dv_key):
        yield from pq.read_table(path, columns=names).to_batches()
        return
    import pyarrow as pa

    # the key column must be readable even when the projection pruned
    # it — read it alongside, filter, then drop it back out
    read_cols = names if dv_key in names else list(names) + [dv_key]
    table = pq.read_table(path, columns=read_cols)
    dead = []
    for dv in dv_paths:
        t = pq.read_table(dv, columns=["target", "key"])
        mask = pc.equal(t.column("target"), data_dir)
        dead.append(t.filter(mask).column("key"))
    keys = pa.concat_arrays([c.combine_chunks() for c in dead])
    if len(keys):
        keep = pc.invert(
            pc.is_in(table.column(dv_key), value_set=keys)
        )
        table = table.filter(keep)
    yield from table.select(names).to_batches()


class TxlogBatchReader(DataSourceReader):
    def __init__(self, options, names):
        self.log_dir = options.get("path")
        self.names = names
        #: key column the dv sidecars tombstone (Delta's DV descriptor
        #: carries row positions; this format carries keys) — required
        #: only when the log holds live dv actions
        self.dv_key = options.get("dv_key", "")
        if not self.log_dir:
            raise ValueError("txlog source requires a path option")

    def partitions(self):
        rows = _log_rows(self.log_dir)
        live = _live_files(rows)
        dvs = _live_dvs(rows, live)
        if dvs and not self.dv_key:
            raise ValueError(
                "txlog table has live deletion vectors; pass "
                ".option('dv_key', <key column>) so the reader can "
                "apply them"
            )
        return [
            _PartFilePartition(p, d, dvs.get(d, []))
            for d in live
            for p in _part_files([d])
        ]

    def read(self, partition):
        yield from _read_part(
            partition.path,
            self.names,
            partition.data_dir,
            partition.dv_paths,
            self.dv_key,
        )


class TxlogStreamReader(DataSourceStreamReader):
    """Commit-window micro-batches: ``latestOffset`` reports the log
    head, ``partitions(start, end)`` lists the window's still-live
    added files, and ``read`` decodes executor-side. Offsets are just
    commit versions — pure log metadata, so a checkpointed restart
    re-plans exactly the same window."""

    def __init__(self, options, names):
        self.log_dir = options.get("path")
        self.names = names
        #: Delta's streaming contract: a source over a mutated table
        #: fails by default — set ignore_deletes=true to consume the
        #: add-only file stream anyway (deletes surface via the change
        #: data feed, not this source)
        self.ignore_deletes = (
            str(options.get("ignore_deletes", "false")).lower() == "true"
        )
        if not self.log_dir:
            raise ValueError("txlog stream source requires a path option")

    def initialOffset(self):
        return {"version": -1}

    def _head(self) -> int:
        rows = _log_rows(self.log_dir)
        return max((r["commit"] for r in rows), default=-1)

    def latestOffset(self, start=None, limit=None):
        # the current log head: each micro-batch consumes every commit
        # that landed since the last one (availableNow captures the
        # head ONCE and drains to it, so returning anything less would
        # under-read; a continuous trigger gets one batch per poll with
        # all new commits — the standard file-source pacing).
        return {"version": self._head()}

    def partitions(self, start, end):
        rows = _log_rows(self.log_dir)
        if not self.ignore_deletes and any(
            r.get("action") == "dv" and r["commit"] <= int(end["version"])
            for r in rows
        ):
            raise ValueError(
                "txlog stream source over a table with deletion vectors:"
                " this source streams ADDED files only and would"
                " silently miss the deletes. Use the change data feed"
                " for row-level changes, or pass"
                " .option('ignore_deletes', 'true') to consume the"
                " add-only stream deliberately."
            )
        files = _incremental_files(
            rows, int(start["version"]), int(end["version"])
        )
        return [_PartFilePartition(p) for p in _part_files(files)]

    def read(self, partition):
        yield from _read_part(partition.path, self.names)

    def commit(self, end):
        pass


class TxlogDataSource(DataSource):
    @classmethod
    def name(cls):
        return "txlog"

    def schema(self):
        return _infer_ddl(self.options.get("path"))

    def reader(self, schema):
        return TxlogBatchReader(self.options, [f.name for f in schema.fields])

    def streamReader(self, schema):
        return TxlogStreamReader(
            self.options, [f.name for f in schema.fields]
        )


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('txlog')``."""
    spark.dataSource.register(TxlogDataSource)
