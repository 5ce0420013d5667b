"""A Python DataSource V2 over the transaction-log table format — the
log-backed tables the sinks tier writes (`queries/sinks.py`:
`_build_txlog_table` and every `sink_txlog_*` mutation), readable AND
writable as a first-class Spark source:

    spark.read.format("txlog").option("path", log_dir).load()
    spark.readStream.format("txlog").option("path", log_dir).load()
    df.write.format("txlog").mode("append"|"overwrite").save(log_dir)
    df.writeStream.format("txlog").option("checkpointLocation", ...)\
        .start(log_dir)

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

Batch write = the two-phase output commit over the log's optimistic
put-if-absent primitive: each task streams its Arrow RecordBatches into
a temp parquet file (columnar all the way — `DataSourceArrowWriter`,
the write-side twin of the reader's RecordBatch fast path); the
driver-side ``commit`` renames temps into one new data dir and commits
ONE log version (``append`` = add actions only; ``overwrite`` = remove
every live file + add, both revalidated per commit-race retry). A
failed/speculated task can never publish a half-written file, and a
lost commit race never corrupts the log — the loser's files are
orphans until a later commit references them.

Streaming write = epoch-keyed exactly-once: per micro-batch the tasks
stage temps, and ``commit(messages, batchId)`` publishes them under a
DETERMINISTIC epoch-named data dir plus a ``txn`` idempotence marker
(Delta's txn/appId action) in the same log version; a replayed
micro-batch (crash between sink commit and checkpoint commit) finds
its marker in the log and skips instead of double-applying.

Reference scope: the reference framework (core.py:15-110) reads opaque
input directories; this connector is the engine-idiomatic equivalent
surface for its own table format.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
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


def _live_dvs(rows: list, live: list, as_of=None) -> dict:
    """Deletion-vector applicability from pure log metadata (matching
    queries/sinks._txlog_live_dvs): sidecar -> its targets, kept only
    where a target is still live (and, for time travel, only DVs
    committed at or before ``as_of`` — later deletes must not apply to
    an earlier snapshot). Returned as {target data dir: [sidecar
    paths]} so each partition can resolve its own tombstones
    executor-side."""
    live_set = set(live)
    by_target: dict = {}
    for r in rows:
        if as_of is not None and r["commit"] > as_of:
            continue
        if r.get("action") == "dv" and r.get("path") is not None:
            t = r.get("target")
            if t in live_set:
                by_target.setdefault(t, []).append(r["path"])
    return by_target


def _resolve_as_of(rows: list, options) -> "int | None":
    """Time-travel resolution for the reader options: ``version_as_of``
    (a commit number) or ``timestamp_as_of`` (microseconds, resolved to
    the latest commit whose commitInfo ts <= t — the same rule as the
    engine's AS OF TIMESTAMP). None = head."""
    v = options.get("version_as_of")
    t = options.get("timestamp_as_of")
    if v is not None and t is not None:
        raise ValueError(
            "pass at most one of version_as_of / timestamp_as_of"
        )
    if v is not None:
        return int(v)
    if t is not None:
        ts = int(t)
        cand = [
            r["commit"]
            for r in rows
            if r.get("action") == "commitInfo"
            and r.get("ts") is not None
            and r["ts"] <= ts
        ]
        if not cand:
            raise ValueError(
                f"no commit at or before timestamp {ts}; table history"
                " begins later"
            )
        return max(cand)
    return None


#: Spark DDL type -> pyarrow type factory, for null-filling columns a
#: pre-evolution file lacks (inverse of _infer_ddl's mapping)
def _arrow_type(ddl: str):
    import pyarrow as pa

    m = {
        "bigint": pa.int64(),
        "int": pa.int32(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
    }
    if ddl in m:
        return m[ddl]
    raise ValueError(f"unsupported mapped column type: {ddl}")


def _mapping_as_of(rows: list, as_of=None):
    """The column mapping in force at ``as_of`` (None = head): latest
    metaData action whose schema payload is a JSON mapping document.
    None when the table is unmapped."""
    cand = [
        r
        for r in rows
        if r["action"] == "metaData"
        and (as_of is None or r["commit"] <= as_of)
        and r.get("schema")
        and str(r["schema"]).lstrip().startswith("{")
    ]
    if not cand:
        return None
    return json.loads(max(cand, key=lambda r: r["commit"])["schema"])


def _part_files(data_dirs: list) -> list:
    """Part files under each logged path. A logged path is usually a
    data DIR; stats-carrying writes (Delta-style one-add-per-file)
    log the part FILE itself — pass through unchanged."""
    out = []
    for d in data_dirs:
        if os.path.isfile(d):
            out.append(d)
            continue
        out.extend(
            sorted(glob.glob(os.path.join(d, "part-*.parquet")))
            or sorted(glob.glob(os.path.join(d, "part-*")))
        )
    return out


def _infer_ddl(log_dir: str, options=None) -> str:
    """Spark DDL for the table at the requested snapshot: a
    column-MAPPED table's schema is its mapping's logical names/types
    (the log owns the schema, files only know physical names);
    otherwise the first live file's parquet footer (pyarrow) — the
    same footer-driven inference a JVM parquet scan performs."""
    import pyarrow.parquet as pq

    rows = _log_rows(log_dir)
    as_of = _resolve_as_of(rows, options or {})
    mapping = _mapping_as_of(rows, as_of)
    if mapping is not None:
        return ", ".join(
            f"`{c['name']}` {c['type']}" for c in mapping["columns"]
        )
    live = _live_files(rows, as_of=as_of)
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


def attempt_commit(
    log_dir: str, version: int, actions, op: str = "WRITE", metrics=None
):
    """ONE optimistic-concurrency commit attempt: atomically create
    ``{version:05d}.json`` (O_CREAT|O_EXCL — the put-if-absent primitive
    Delta uses on object stores). Returns False if a concurrent writer
    already owns this version; the caller must re-read the log,
    revalidate against the new snapshot, and retry at the next version.
    Losing a race never corrupts the log: the loser's data files are
    orphans until a later commit references them.

    Unless the caller supplied its own, a ``commitInfo`` action (Delta's
    commit provenance record) is prepended: operation name ``op`` plus a
    microsecond timestamp clamped to be strictly greater than the log
    head's — commit timestamps are non-decreasing even across wall-clock
    skew, which is what makes ``AS OF TIMESTAMP`` resolution
    (latest commit with ts <= t) well-defined.

    This is the ONE commit primitive of the format — the engine's
    mutators (`queries/sinks._txlog_attempt_commit`) delegate here, so
    the connector and the query tier can never drift on log semantics.
    """
    acts = list(actions)
    if not any(a.get("action") == "commitInfo" for a in acts):
        import time

        prev = max(
            (
                r.get("ts") or 0
                for r in _log_rows(log_dir)
                if r.get("action") == "commitInfo"
            ),
            default=0,
        )
        ci = {
            "commit": version,
            "action": "commitInfo",
            "op": op,
            "ts": max(int(time.time() * 1_000_000), prev + 1),
        }
        if metrics:
            # operation metrics (Delta's operationMetrics): driver-known
            # counters only — recording them must never cost a data pass
            ci["metrics"] = json.dumps(metrics, sort_keys=True)
        acts.insert(0, ci)
    path = os.path.join(log_dir, f"{version:05d}.json")
    try:
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError:
        return False
    with os.fdopen(fd, "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    return True


class _PartFilePartition(InputPartition):
    def __init__(self, path: str, data_dir: str = "", dv_paths=None,
                 colmap=None):
        self.path = path
        self.data_dir = data_dir
        self.dv_paths = dv_paths or []
        #: logical -> (physical, ddl type) when the snapshot is
        #: column-mapped; pickled WITH the partition so executors see
        #: the planning-time mapping (only pushFilters-era self
        #: mutations are guaranteed visible to read())
        self.colmap = colmap


def _read_part(path: str, names: list, data_dir: str = "",
               dv_paths=None, dv_key: str = "", colmap=None):
    """Executor-side decode of one parquet part file via pyarrow,
    yielding whole Arrow RecordBatches (the Spark 4 Python DataSource
    fast path — columnar hand-off, no per-row Python tuples). When the
    file has live deletion vectors, their keys are anti-filtered HERE,
    still columnar (pyarrow compute is_in): merge-on-read tables read
    through the connector see exactly what the engine's DV-aware replay
    sees, never resurrected rows. A column-MAPPED table's files are
    read under their PHYSICAL names and projected to logical; a
    physical column the file predates (re-ADD after DROP binds a fresh
    physical name) null-fills — so dropped data can never resurrect
    through the connector either."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if colmap:
        import pyarrow as pa

        avail = set(pq.read_schema(path).names)
        present = [colmap[n][0] for n in names if colmap[n][0] in avail]
        table = pq.read_table(path, columns=present)
        cols, fields = [], []
        for n in names:
            phys, ddl = colmap[n]
            typ = _arrow_type(ddl)
            if phys in avail:
                col = table.column(phys).cast(typ)
            else:
                col = pa.nulls(table.num_rows, type=typ)
            cols.append(col)
            fields.append(pa.field(n, typ))
        yield from pa.table(cols, schema=pa.schema(fields)).to_batches()
        return
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


def _prunes_file(f, add: dict) -> bool:
    """True iff pushed filter ``f`` PROVES the file behind ``add``
    holds no matching rows, from the add action's own metadata:
    partition value (part/part_col) or recorded column bounds
    (min_key/max_key/stats_col). Conservative by construction — any
    unprovable case keeps the file, and Spark re-applies every filter
    post-scan, so pruning is a pure superset guarantee."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        In,
        LessThan,
        LessThanOrEqual,
    )

    if len(f.attribute) != 1:
        return False
    col = f.attribute[0]
    if add.get("part_col") == col and add.get("part") is not None:
        v = add["part"]
        if isinstance(f, EqualTo) and isinstance(f.value, str):
            return v != f.value
        if isinstance(f, In):
            vals = [x for x in f.value if isinstance(x, str)]
            return len(vals) == len(f.value) and v not in vals
        return False
    if (
        add.get("stats_col") == col
        and add.get("min_key") is not None
        and add.get("max_key") is not None
    ):
        mn, mx = add["min_key"], add["max_key"]
        try:
            if isinstance(f, EqualTo):
                return f.value < mn or f.value > mx
            if isinstance(f, GreaterThan):
                return mx <= f.value
            if isinstance(f, GreaterThanOrEqual):
                return mx < f.value
            if isinstance(f, LessThan):
                return mn >= f.value
            if isinstance(f, LessThanOrEqual):
                return mn > f.value
            if isinstance(f, In):
                return all(v < mn or v > mx for v in f.value)
        except TypeError:
            return False  # incomparable types: keep the file
    return False


def _live_adds(rows: list, as_of=None) -> dict:
    """{live path: its winning add action} — the per-file metadata
    (part values, recorded stats) pruning evaluates against."""
    last: dict = {}
    for r in sorted(rows, key=lambda r: (r["commit"], r["action"] or "")):
        if as_of is not None and r["commit"] > as_of:
            continue
        if r["action"] in ("add", "remove") and r.get("path") is not None:
            last[r["path"]] = r
    return {p: r for p, r in last.items() if r["action"] == "add"}


class TxlogBatchReader(DataSourceReader):
    def __init__(self, options, names):
        self.log_dir = options.get("path")
        self.names = names
        #: key column the dv sidecars tombstone (Delta's DV descriptor
        #: carries row positions; this format carries keys) — required
        #: only when the log holds live dv actions
        self.dv_key = options.get("dv_key", "")
        #: time travel: version_as_of / timestamp_as_of reader options
        #: (resolved against the log at planning time)
        self.version_as_of = options.get("version_as_of")
        self.timestamp_as_of = options.get("timestamp_as_of")
        #: filters Spark pushed down (pushFilters) — used ONLY to
        #: prune whole files at planning time from log metadata
        self._pushed = []
        if not self.log_dir:
            raise ValueError("txlog source requires a path option")

    def _as_of_opts(self) -> dict:
        return {
            "version_as_of": self.version_as_of,
            "timestamp_as_of": self.timestamp_as_of,
        }

    def pushFilters(self, filters):
        """Planning-time file pruning from pushed predicates (the
        Python DataSource pushdown hook, Spark 4.1): equality/range/IN
        filters on columns whose bounds the LOG records — partition
        values of partitioned writes, min/max of stats-recording
        writes — shrink the file list in ``partitions()``. EVERY
        filter is returned as residual so Spark re-applies it exactly:
        metadata pruning is a superset guarantee, never a row filter,
        so a loose bound can only cost performance, never rows."""
        self._pushed = list(filters)
        return filters

    def partitions(self):
        rows = _log_rows(self.log_dir)
        as_of = _resolve_as_of(rows, self._as_of_opts())
        mapping = _mapping_as_of(rows, as_of)
        live = _live_files(rows, as_of=as_of)
        if self._pushed:
            adds = _live_adds(rows, as_of=as_of)
            live = [
                p
                for p in live
                if not any(_prunes_file(f, adds[p]) for f in self._pushed)
            ]
        dvs = _live_dvs(rows, live, as_of=as_of)
        if dvs and mapping is not None:
            raise ValueError(
                "txlog reader: column-mapped tables with live deletion"
                " vectors are not supported through the connector yet"
            )
        if dvs and not self.dv_key:
            raise ValueError(
                "txlog table has live deletion vectors; pass "
                ".option('dv_key', <key column>) so the reader can "
                "apply them"
            )
        colmap = (
            {c["name"]: (c["physical"], c["type"]) for c in mapping["columns"]}
            if mapping is not None
            else None
        )
        return [
            _PartFilePartition(p, d, dvs.get(d, []), colmap)
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
            partition.colmap,
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
        #: admission control (Delta's maxFilesPerTrigger analogue, in
        #: commit units): cap each micro-batch at this many commits
        #: past the last planned end. 0 = unbounded. The Python stream
        #: API has no ReadLimit plumbing and the engine asks for
        #: latestOffset BEFORE it reveals the start (observed call
        #: order; initialOffset comes later), so the cursor is reader
        #: instance state seeded by the first partitions() call: the
        #: FIRST planned batch takes the whole backlog (catch-up),
        #: every batch after it admits at most this many commits.
        #: Correctness never depends on the cap — offsets stay pure
        #: log metadata; under-admitting only defers commits.
        self.max_commits = int(options.get("max_commits_per_trigger", "0"))
        self._cursor = None
        if not self.log_dir:
            raise ValueError("txlog stream source requires a path option")

    def initialOffset(self):
        return {"version": -1}

    def _head(self) -> int:
        rows = _log_rows(self.log_dir)
        return max((r["commit"] for r in rows), default=-1)

    def latestOffset(self):
        # the current log head: each micro-batch consumes every commit
        # that landed since the last one (with admission control on,
        # availableNow drains to the head in capped steps instead of
        # one giant batch; a continuous trigger gets one capped batch
        # per poll — the standard file-source pacing).
        head = self._head()
        if self.max_commits > 0 and self._cursor is not None:
            return {"version": min(head, self._cursor + self.max_commits)}
        return {"version": head}

    def partitions(self, start, end):
        self._cursor = int(end["version"])
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


#: commit-race retry budget for the connector's writers (each retry
#: revalidates against a fresh log snapshot, so this bounds live-lock
#: under heavy writer contention, not correctness)
_WRITE_MAX_RETRIES = 20


def checkpoint_log(log_dir: str, version: int) -> str:
    """Action-complete log CHECKPOINT, stdlib+pyarrow only (the
    connector's writers run in Spark's Python planning worker, where no
    SparkSession exists) — the same reconciliation as
    queries/sinks.txlog_checkpoint: add/remove last-wins per path, dv
    kept per (sidecar, target), txn markers and metaData rows kept,
    one commitInfo per commit kept (timestamp resolution and history
    survive compaction). Writes ONE parquet file named
    ``_checkpoint_<version>`` carrying every column of the engine's
    action schema and DELETES the compacted JSON commits. Two racers
    checkpointing the same version write identical content from the
    same immutable log prefix — last rename wins, benign."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = _log_rows(log_dir)
    state: dict = {}
    for r in sorted(
        (r for r in rows if r["commit"] <= version),
        key=lambda r: (r["commit"], r["action"] or ""),
    ):
        if r["action"] in ("add", "remove"):
            state[("file", r["path"])] = r
        elif r["action"] == "dv":
            state[("dv", r["path"], r.get("target"))] = r
        elif r["action"] == "txn":
            state[("txn", r["path"])] = r
        elif r["action"] == "metaData":
            state[("meta", r["commit"])] = r
        elif r["action"] == "commitInfo":
            state[("ci", r["commit"])] = r
    cols = [
        ("commit", pa.int64()),
        ("action", pa.string()),
        ("path", pa.string()),
        ("target", pa.string()),
        ("constraint", pa.string()),
        ("part", pa.string()),
        ("schema", pa.string()),
        ("ts", pa.int64()),
        ("op", pa.string()),
        ("metrics", pa.string()),
        ("min_key", pa.int64()),
        ("max_key", pa.int64()),
        ("part_col", pa.string()),
        ("stats_col", pa.string()),
    ]
    vals = list(state.values())
    table = pa.table(
        {n: pa.array([v.get(n) for v in vals], type=t) for n, t in cols}
    )
    # a DIRECTORY of part files, matching the engine's layout — a bare
    # file named _checkpoint_* would be invisible to Spark readers
    # (leading underscore = Hadoop hidden-file convention)
    ckpt = os.path.join(log_dir, f"_checkpoint_{version:05d}")
    tmp = ckpt + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(table, os.path.join(tmp, "part-00000.parquet"))
    shutil.rmtree(ckpt, ignore_errors=True)
    os.replace(tmp, ckpt)
    for f in glob.glob(os.path.join(log_dir, "*.json")):
        base = os.path.basename(f).split(".")[0]
        if base.isdigit() and int(base) <= version:
            try:
                os.remove(f)
            except FileNotFoundError:
                pass
    return ckpt


class _TxlogWriteCommit(WriterCommitMessage):
    """Per-task commit message: the temp parquet file the task staged
    (None for an empty partition), its row count, and — when the write
    carries a ``stats_col`` — the task's exact min/max of that column.
    Must be picklable (travels task -> driver)."""

    def __init__(self, tmp_path, n_rows: int, mn=None, mx=None):
        self.tmp_path = tmp_path
        self.n_rows = n_rows
        self.mn = mn
        self.mx = mx
        #: partitioned writes: list of (tmp_path, partition value, rows)
        self.parts = None


def _writer_dirs(options) -> tuple:
    """(log_dir, data_root): the table address is the LOG dir (same
    option the readers take); data files land in the sibling ``data``
    dir unless ``data_dir`` overrides it — matching the layout
    `queries/sinks._build_txlog_table` creates."""
    log_dir = options.get("path")
    if not log_dir:
        raise ValueError("txlog sink requires a path option (the log dir)")
    data_root = options.get("data_dir") or os.path.join(
        os.path.dirname(log_dir.rstrip("/")), "data"
    )
    return log_dir, data_root


def _stage_batches(
    data_root: str, iterator, stats_col: str = ""
) -> _TxlogWriteCommit:
    """Task-side staging: stream Arrow RecordBatches into ONE temp
    parquet file (columnar hand-off from Spark, columnar write via
    pyarrow — no Python rows anywhere), folding exact ``stats_col``
    min/max per batch when requested (pyarrow compute — the stats a
    real lakehouse writer records in its add action). Empty partitions
    stage nothing."""
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    it = iter(iterator)
    first = next(it, None)
    if first is None:
        return _TxlogWriteCommit(None, 0)
    tmp_dir = os.path.join(data_root, "_ds_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    tmp = os.path.join(tmp_dir, f"stage-{uuid.uuid4().hex}.parquet")
    n = 0
    mn = mx = None
    with pq.ParquetWriter(tmp, first.schema) as w:
        for b in _chain(first, it):
            w.write_batch(b)
            n += b.num_rows
            if stats_col and b.num_rows:
                s = pc.min_max(b.column(stats_col))
                bmn, bmx = s["min"].as_py(), s["max"].as_py()
                mn = bmn if mn is None else min(mn, bmn)
                mx = bmx if mx is None else max(mx, bmx)
    return _TxlogWriteCommit(tmp, n, mn, mx)


def _chain(first, rest):
    yield first
    yield from rest


def _stage_partitioned(
    data_root: str, iterator, partition_col: str
) -> _TxlogWriteCommit:
    """Task-side staging for a PARTITIONED write: each Arrow batch is
    split by the partition column's values (pyarrow compute — columnar
    masks, no Python rows) and streamed into one temp parquet file per
    partition value seen by this task. Returns the (tmp, value, rows)
    triples in ``parts`` — the driver groups them into per-partition
    data dirs and per-partition add actions."""
    import uuid

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    writers: dict = {}
    counts: dict = {}
    paths: dict = {}
    n_total = 0
    try:
        for b in iterator:
            if b.num_rows == 0:
                continue
            col = b.column(partition_col)
            if col.null_count:
                raise ValueError(
                    f"partition column {partition_col!r} must be non-null"
                )
            for v in pc.unique(col).to_pylist():
                mask = pc.equal(col, v)
                sub = b.filter(mask)
                w = writers.get(v)
                if w is None:
                    tmp_dir = os.path.join(data_root, "_ds_tmp")
                    os.makedirs(tmp_dir, exist_ok=True)
                    paths[v] = os.path.join(
                        tmp_dir, f"stage-{uuid.uuid4().hex}.parquet"
                    )
                    w = writers[v] = pq.ParquetWriter(paths[v], b.schema)
                    counts[v] = 0
                w.write_batch(sub)
                counts[v] += sub.num_rows
                n_total += sub.num_rows
    finally:
        for w in writers.values():
            w.close()
    msg = _TxlogWriteCommit(None, n_total)
    msg.parts = [(paths[v], str(v), counts[v]) for v in sorted(paths)]
    return msg


def _publish(msgs, final_dir: str) -> None:
    """Rename the tasks' temp files into the commit's data dir with
    part-file names the replay readers glob (`_part_files`)."""
    os.makedirs(final_dir, exist_ok=True)
    for k, m in enumerate(msgs):
        os.replace(
            m.tmp_path, os.path.join(final_dir, f"part-{k:05d}.parquet")
        )


def _drop_temps(messages) -> None:
    for m in messages:
        if m is None:
            continue
        tmps = [m.tmp_path] if m.tmp_path else []
        tmps += [t for t, _, _ in (m.parts or [])]
        for t in tmps:
            try:
                os.remove(t)
            except FileNotFoundError:
                pass


def _check_append_schema(log_dir: str, names, arrow_schema=None) -> None:
    """Appending to a non-empty table must match its column set — the
    footer of any live part file is the table's physical schema (same
    footer `_infer_ddl` reads). Order-insensitive: the log stores whole
    files, so per-file column order is self-describing. When the
    incoming Arrow schema is available, TYPES are checked too (by DDL
    normalization, so string/large_string unify); a type the DDL map
    doesn't know is skipped, never a false reject."""
    import pyarrow.parquet as pq

    live = _live_files(_log_rows(log_dir))
    parts = _part_files(live[:1])
    if not parts:
        return
    table_schema = pq.read_schema(parts[0])
    have = sorted(table_schema.names)
    if sorted(names) != have:
        raise ValueError(
            f"txlog append schema mismatch: table has {have}, "
            f"write has {sorted(names)}"
        )
    if arrow_schema is None:
        return

    def _ddl_of(t) -> str:
        s = str(t)
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
        if s in m:
            return m[s]
        if s.startswith("timestamp"):
            return "timestamp"
        return ""  # unknown: skip the type check for this column

    for n in names:
        want = _ddl_of(table_schema.field(n).type)
        got = _ddl_of(arrow_schema.field(n).type)
        if want and got and want != got:
            raise ValueError(
                f"txlog append type mismatch on {n!r}: table has "
                f"{want}, write has {got}"
            )


class TxlogBatchWriter(DataSourceArrowWriter):
    """Batch writer half (``df.write.format('txlog')``): two-phase
    output commit composed with the log's optimistic concurrency.
    Tasks stage temp parquet; the driver ``commit`` publishes them
    under one fresh ``ds-write-*`` data dir and commits ONE log
    version. ``overwrite`` logically removes every live file in the
    SAME commit (atomic replace, old versions stay time-travelable);
    the remove set is recomputed from a fresh snapshot on every
    commit-race retry, so racing an engine-side mutator never loses
    its update."""

    def __init__(self, options, schema, overwrite: bool):
        self.log_dir, self.data_root = _writer_dirs(options)
        self.names = [f.name for f in schema.fields]
        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            self.arrow_schema = to_arrow_schema(schema)
        except Exception:
            self.arrow_schema = None  # names-only check still applies
        self.overwrite = overwrite
        #: column whose exact min/max the commit records on its add
        #: action (min_key/max_key) — feeds the stats-skipping reader
        #: (queries/sinks.txlog_stats_read) with zero extra passes
        self.stats_col = options.get("stats_col", "")
        if self.stats_col and self.stats_col not in self.names:
            raise ValueError(
                f"stats_col {self.stats_col!r} not in write schema"
            )
        #: Hive/Delta-style partitioned layout: tasks split their Arrow
        #: batches by this column's value; the commit publishes one
        #: data dir per partition value and one ``part``-valued add
        #: action each, so partition-pruned reads
        #: (queries/sinks._txlog_part_live) plan on pure log metadata
        self.partition_col = options.get("partition_col", "")
        if self.partition_col and self.partition_col not in self.names:
            raise ValueError(
                f"partition_col {self.partition_col!r} not in write schema"
            )
        if self.partition_col and self.stats_col:
            raise ValueError(
                "partition_col and stats_col are mutually exclusive"
            )

    def write(self, iterator):
        if self.partition_col:
            return _stage_partitioned(
                self.data_root, iterator, self.partition_col
            )
        return _stage_batches(self.data_root, iterator, self.stats_col)

    def commit(self, messages):
        import uuid

        os.makedirs(self.log_dir, exist_ok=True)
        if not self.overwrite:
            _check_append_schema(
                self.log_dir, self.names, self.arrow_schema
            )
        msgs = [m for m in messages if m is not None and m.tmp_path]
        final_dir = os.path.join(
            self.data_root, f"ds-write-{uuid.uuid4().hex[:8]}"
        )
        part_adds = []
        if self.partition_col:
            from urllib.parse import quote

            groups: dict = {}
            for m in messages:
                for tmp, v, _ in (m.parts or []) if m else []:
                    groups.setdefault(v, []).append(tmp)
            for v in sorted(groups):
                pdir = os.path.join(
                    final_dir, f"{self.partition_col}={quote(v, safe='')}"
                )
                os.makedirs(pdir, exist_ok=True)
                for k, tmp in enumerate(groups[v]):
                    os.replace(
                        tmp, os.path.join(pdir, f"part-{k:05d}.parquet")
                    )
                part_adds.append((pdir, v))
        elif msgs:
            _publish(msgs, final_dir)
        for _ in range(_WRITE_MAX_RETRIES):
            rows = _log_rows(self.log_dir)
            version = max((r["commit"] for r in rows), default=-1) + 1
            actions = []
            if self.overwrite:
                actions += [
                    {"commit": version, "action": "remove", "path": p}
                    for p in _live_files(rows)
                ]
            if part_adds:
                actions += [
                    {
                        "commit": version,
                        "action": "add",
                        "path": pdir,
                        "part": v,
                        "part_col": self.partition_col,
                    }
                    for pdir, v in part_adds
                ]
            elif msgs and self.stats_col:
                # Delta's shape: one add PER FILE, each carrying that
                # task's exact stats — a range-partitioned write yields
                # per-file key ranges the stats-skipping reader prunes
                # on, from a single commit of a single job
                actions += [
                    {
                        "commit": version,
                        "action": "add",
                        "path": os.path.join(
                            final_dir, f"part-{k:05d}.parquet"
                        ),
                        "min_key": m.mn,
                        "max_key": m.mx,
                        # which column the bounds describe — lets the
                        # reader's pushFilters prune without options
                        "stats_col": self.stats_col,
                    }
                    for k, m in enumerate(msgs)
                ]
            elif msgs:
                actions.append(
                    {"commit": version, "action": "add", "path": final_dir}
                )
            if not actions:
                return  # empty append: nothing to commit
            if attempt_commit(
                self.log_dir,
                version,
                actions,
                op="OVERWRITE" if self.overwrite else "APPEND",
            ):
                return
        raise RuntimeError(
            f"txlog write lost the commit race {_WRITE_MAX_RETRIES} times"
        )

    def abort(self, messages):
        _drop_temps(messages)


class TxlogStreamWriter(DataSourceStreamArrowWriter):
    """Streaming writer half (``df.writeStream.format('txlog')``):
    exactly-once via a per-epoch ``txn`` idempotence marker committed
    ATOMICALLY with the epoch's add action. Replay of a micro-batch
    (crash after the log commit but before the checkpoint commit)
    finds its marker and skips; a crash after the data-dir publish but
    before the log commit leaves an unreferenced dir that the replay
    clears and republishes — either way each epoch's rows land exactly
    once. ``queryName``-scoped ``txn_id`` option lets multiple streams
    share one table."""

    def __init__(self, options, schema):
        self.log_dir, self.data_root = _writer_dirs(options)
        self.names = [f.name for f in schema.fields]
        self.txn_prefix = options.get("txn_id", "txlog-stream")
        self.stats_col = options.get("stats_col", "")
        if self.stats_col and self.stats_col not in self.names:
            raise ValueError(
                f"stats_col {self.stats_col!r} not in write schema"
            )
        #: Delta's checkpointInterval: after every Nth commit, compact
        #: the log into a parquet checkpoint (stdlib `checkpoint_log`)
        #: so a long-lived streaming table's replay cost stays
        #: O(live state + tail), not O(commits ever)
        self.ckpt_interval = int(options.get("checkpoint_interval", "0"))

    def write(self, iterator):
        return _stage_batches(self.data_root, iterator, self.stats_col)

    def _txn_done(self, rows, txn: str) -> bool:
        return any(
            r.get("action") == "txn" and r.get("path") == txn for r in rows
        )

    def commit(self, messages, batchId) -> None:
        txn = f"{self.txn_prefix}-{batchId}"
        msgs = [m for m in messages if m is not None and m.tmp_path]
        os.makedirs(self.log_dir, exist_ok=True)
        if self._txn_done(_log_rows(self.log_dir), txn):
            # replayed epoch: its version is already in the log
            _drop_temps(msgs)
            return
        final_dir = os.path.join(
            self.data_root, f"stream-{self.txn_prefix}-epoch-{batchId:010d}"
        )
        # a crashed prior attempt may have published files without
        # committing the log version; clear so the rename set below is
        # the COMPLETE content of this epoch
        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)
        if msgs:
            _publish(msgs, final_dir)
        for _ in range(_WRITE_MAX_RETRIES):
            rows = _log_rows(self.log_dir)
            if self._txn_done(rows, txn):
                return  # a concurrent replayer committed this epoch
            version = max((r["commit"] for r in rows), default=-1) + 1
            actions = []
            if msgs:
                add = {"commit": version, "action": "add", "path": final_dir}
                if self.stats_col:
                    add["min_key"] = min(m.mn for m in msgs)
                    add["max_key"] = max(m.mx for m in msgs)
                actions.append(add)
            # the marker commits even for an empty epoch, so replay
            # detection never depends on the epoch having had rows
            actions.append(
                {"commit": version, "action": "txn", "path": txn}
            )
            if attempt_commit(
                self.log_dir, version, actions, op="STREAMING UPDATE"
            ):
                if (
                    self.ckpt_interval > 0
                    and (version + 1) % self.ckpt_interval == 0
                ):
                    checkpoint_log(self.log_dir, version)
                return
        raise RuntimeError(
            f"txlog stream write lost the commit race "
            f"{_WRITE_MAX_RETRIES} times (epoch {batchId})"
        )

    def abort(self, messages, batchId) -> None:
        _drop_temps(messages)


class TxlogDataSource(DataSource):
    @classmethod
    def name(cls):
        return "txlog"

    def schema(self):
        return _infer_ddl(self.options.get("path"), self.options)

    def reader(self, schema):
        return TxlogBatchReader(self.options, [f.name for f in schema.fields])

    def streamReader(self, schema):
        return TxlogStreamReader(
            self.options, [f.name for f in schema.fields]
        )

    def writer(self, schema, overwrite: bool):
        return TxlogBatchWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        return TxlogStreamWriter(self.options, schema)


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('txlog')``.

    Also enables Python data source filter pushdown (a runtime SQL
    conf, default false in Spark 4.1): the batch reader implements
    ``pushFilters``, and Spark HARD-FAILS a pushFilters-implementing
    reader when the conf is off rather than silently skipping pruning
    — so the connector's one registration entry point turns it on,
    vanilla driver sessions included."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(TxlogDataSource)
