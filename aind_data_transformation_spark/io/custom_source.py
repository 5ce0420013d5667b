"""Custom connector via the Python DataSource API (Spark 4).

The reference's domain is opaque-directory ETL (reference core.py:50-55 —
``input_source`` is just a path whose payload only the concrete job
understands). The Python DataSource API is the idiomatic Spark-4 way to
turn such a proprietary payload into a first-class readable format:
register once, then ``spark.read.format("name")`` — with real partition
parallelism, schema projection, and no driver-side materialization.

``RecordDataSource`` here reads a directory of length-prefixed binary
record files (a stand-in for an instrument's raw dump format): each
``*.rec`` file holds ``[uint32 len][payload bytes]*``. One input partition
per file — Spark schedules files across executors exactly like a built-in
source. A real deployment swaps ``_parse_file`` for the instrument codec.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RECORD_SCHEMA = StructType(
    [
        StructField("file", StringType()),
        StructField("record_idx", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def write_record_file(path: str, payloads: list) -> None:
    """Writer half of the format (for tests / roundtrips)."""
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<I", len(p)))
            f.write(p)


def _parse_file(path: str):
    with open(path, "rb") as f:
        idx = 0
        while True:
            head = f.read(4)
            if len(head) < 4:
                return
            (n,) = struct.unpack("<I", head)
            yield (os.path.basename(path), idx, n, f.read(n))
            idx += 1


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class RecordReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("record source requires a path option")

    def partitions(self):
        files = sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.endswith(".rec")
        )
        return [_FilePartition(p) for p in files]

    def read(self, partition):
        yield from _parse_file(partition.path)


class RecordStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: the instrument keeps appending
    ``*.rec`` files to the directory; each micro-batch consumes the files
    that arrived since the last committed offset.

    The offset is **content-addressed**: a watermark of the last consumed
    file name plus the explicit list of names consumed in the batch that
    produced it (``{"last": name, "files": [...]}``). Positional offsets
    (a count of files in sorted order) silently shift when a file arrives
    whose name sorts before already-committed files — committed batches
    would replay different data, breaking the Structured Streaming
    exactly-once replay contract. Here ``readBetweenOffsets(start, end)``
    replays exactly ``end["files"]`` — a pure function of the committed
    offset, immune to any later directory change; new batches consume
    names strictly greater than the watermark (a late-sorting arrival is
    skipped, never re-shuffling committed data — instrument dumps are
    sequence-numbered, so completeness holds in practice while
    correctness of committed offsets no longer depends on it).

    A Simple reader runs on the driver — right for a control-plane-sized
    trickle of files; a heavy stream would implement the partition-based
    ``DataSourceStreamReader`` instead, with one partition per new file
    exactly like the batch reader."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("record stream source requires a path option")

    def _files(self):
        return sorted(
            f for f in os.listdir(self.dir) if f.endswith(".rec")
        )

    def initialOffset(self):
        return {"last": "", "files": []}

    def read(self, start):
        files = self._files()
        last = start["last"]
        new = [f for f in files if f > last]
        rows = []
        for fname in new:
            rows.extend(_parse_file(os.path.join(self.dir, fname)))
        return iter(rows), {"last": new[-1] if new else last, "files": new}

    def readBetweenOffsets(self, start, end):
        for fname in end["files"]:
            yield from _parse_file(os.path.join(self.dir, fname))


class _RecCommit(WriterCommitMessage):
    """Per-task commit message: the temp file the task wrote and its
    record count. Must be picklable (travels task -> driver)."""

    def __init__(self, tmp_name: str, n_records: int):
        self.tmp_name = tmp_name
        self.n_records = n_records


class RecordWriter(DataSourceWriter):
    """Batch writer half of the connector (``df.write.format(...)``):
    each task streams its partition's ``payload`` column into a
    temporary ``.rec.tmp`` file; the driver-side ``commit`` renames the
    temp files into place and drops a ``_SUCCESS`` manifest — the
    standard two-phase output commit, so a failed/speculated task can
    never leave a half-written visible file (``abort`` removes temps).

    Scale: one file per partition, written streaming row-by-row — no
    buffering of the partition in memory, no driver data path."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("record sink requires a path option")
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.dir, exist_ok=True)
        tmp = f"part-{pid:05d}.rec.tmp"
        n = 0
        with open(os.path.join(self.dir, tmp), "wb") as f:
            for row in iterator:
                payload = bytes(row["payload"])
                f.write(struct.pack("<I", len(payload)))
                f.write(payload)
                n += 1
        return _RecCommit(tmp, n)

    def commit(self, messages):
        total = 0
        for m in messages:
            final = os.path.join(self.dir, m.tmp_name[: -len(".tmp")])
            os.replace(os.path.join(self.dir, m.tmp_name), final)
            total += m.n_records
        with open(os.path.join(self.dir, "_SUCCESS"), "w") as f:
            f.write(str(total))

    def abort(self, messages):
        for m in messages:
            try:
                os.remove(os.path.join(self.dir, m.tmp_name))
            except FileNotFoundError:
                pass


class RecordStreamWriter(DataSourceStreamWriter):
    """Streaming writer half (``df.writeStream.format('lenprefixed')``):
    per micro-batch, each task streams its rows into a uniquely-named
    ``.rec.tmp``; the driver-side ``commit(messages, batchId)`` renames
    them to DETERMINISTIC epoch-keyed names
    (``epoch-<batchId>-part-<k>.rec``) — so a replayed micro-batch (after
    a crash between sink commit and checkpoint commit) overwrites the
    SAME final files instead of duplicating records: idempotent-by-
    naming, the standard exactly-once recipe for file-like streaming
    sinks. ``abort`` removes the batch's temps."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("record stream sink requires a path option")

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.dir, exist_ok=True)
        tmp = f"stream-{uuid.uuid4().hex}.rec.tmp"
        n = 0
        with open(os.path.join(self.dir, tmp), "wb") as f:
            for row in iterator:
                payload = bytes(row["payload"])
                f.write(struct.pack("<I", len(payload)))
                f.write(payload)
                n += 1
        return _RecCommit(tmp, n)

    def commit(self, messages, batchId) -> None:
        # A replayed micro-batch may run with FEWER tasks than a prior
        # partially-committed attempt; renaming by index would then
        # overwrite only the low part numbers and leave the crashed
        # attempt's higher-indexed epoch files behind as duplicates.
        # Clear the whole epoch prefix first so the rename set below is
        # the COMPLETE content of this epoch.
        import glob

        prefix = os.path.join(self.dir, f"epoch-{batchId:010d}-part-")
        for stale in glob.glob(prefix + "*.rec"):
            try:
                os.remove(stale)
            except FileNotFoundError:
                pass
        for k, m in enumerate(messages):
            final = f"{prefix}{k:05d}.rec"
            os.replace(os.path.join(self.dir, m.tmp_name), final)

    def abort(self, messages, batchId) -> None:
        for m in messages:
            try:
                os.remove(os.path.join(self.dir, m.tmp_name))
            except FileNotFoundError:
                pass


class RecordDataSource(DataSource):
    @classmethod
    def name(cls):
        return "lenprefixed"

    def schema(self):
        return RECORD_SCHEMA

    def reader(self, schema):
        return RecordReader(self.options)

    def simpleStreamReader(self, schema):
        return RecordStreamReader(self.options)

    def writer(self, schema, overwrite: bool):
        names = [f.name for f in schema.fields]
        if "payload" not in names:
            raise ValueError(
                "record sink requires a 'payload' binary column"
            )
        return RecordWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool):
        names = [f.name for f in schema.fields]
        if "payload" not in names:
            raise ValueError(
                "record stream sink requires a 'payload' binary column"
            )
        return RecordStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent registration: ``spark.read.format('lenprefixed')``."""
    spark.dataSource.register(RecordDataSource)
