"""Custom Python DataSource for the reference's JSON batch-file format.

The reference's streaming layer persists micro-batches as one JSON blob
per batch — ``{batch_id, timestamp, size, interactions: [...],
ui_summary, training_summary}`` (``src/streaming_service.py:320-344``,
S11) — and its training service re-discovers and flattens them by hand
(``src/training_service.py:305-341,400-412``, S14/U2). This module
turns that interchange format into a first-class Spark connector via
the Spark 4 Python DataSource API: ``spark.read.format("recbatch")``
yields the FLATTENED interaction rows with batch lineage columns, one
input partition per file (the natural parallelism unit for many small
batch blobs — a 1000-file backlog fans out over 1000 tasks).

Registration: ``spark.dataSource.register(BatchFileDataSource)``.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

BATCH_INTERACTION_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.StringType(), False),
        T.StructField("batch_ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("track_id", T.StringType(), True),
        T.StructField("rating", T.DoubleType(), True),
        T.StructField("action", T.StringType(), True),
        T.StructField("play_duration_ms", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def _parse_ts(v):
    if v is None:
        return None
    try:
        return datetime.fromisoformat(str(v))
    except ValueError:
        return None


def _read_blob(path: str) -> Iterator[tuple]:
    with open(path) as fh:
        blob = json.load(fh)
    batch_id = str(blob.get("batch_id", ""))
    batch_ts = _parse_ts(blob.get("timestamp"))
    for it in blob.get("interactions", []):
        yield (
            batch_id,
            batch_ts,
            int(it["user_id"]) if it.get("user_id") is not None else None,
            it.get("track_id"),
            float(it["rating"]) if it.get("rating") is not None else None,
            it.get("action"),
            int(it["play_duration_ms"])
            if it.get("play_duration_ms") is not None
            else None,
            _parse_ts(it.get("timestamp")),
        )


class _BatchFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _BatchFileReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("recbatch source requires a 'path' option")
        self._dir = path
        self._batch_ids: set[str] | None = None  # None = no pruning

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per batch file: lexicographic name order is the
        # reference's time order (batch_XXXXXX_<ts>.json)
        names = sorted(f for f in os.listdir(self._dir) if f.endswith(".json"))
        if self._batch_ids is not None:
            names = [
                f
                for f in names
                if any(f.startswith(b + "_") or f == b + ".json" for b in self._batch_ids)
            ]
        return [_BatchFilePartition(os.path.join(self._dir, f)) for f in names]

    def read(self, partition: _BatchFilePartition) -> Iterator[tuple]:
        yield from _read_blob(partition.path)


class _BatchFileReaderWithPushdown(_BatchFileReader):
    """Variant implementing ``pushFilters`` — merely DEFINING the method
    makes Spark require ``spark.sql.python.filterPushdown.enabled``
    (on in this engine's session factory), so the plain reader above
    stays usable under vanilla sessions (``option("pushdown","false")``
    selects it explicitly)."""

    def pushFilters(self, filters):
        """File-level pruning from pushed ``batch_id`` predicates: the
        naming convention embeds the batch id as the filename prefix
        (``batch_XXXXXX_<ts>.json``), so an EqualTo/In on batch_id
        skips whole files. The filter is still RE-YIELDED so Spark
        re-checks rows post-scan — pruning is an optimization, never a
        correctness dependency on file naming."""
        from pyspark.sql.datasource import EqualTo, In

        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("batch_id",):
                wanted = {str(f.value)}
            elif isinstance(f, In) and f.attribute == ("batch_id",):
                wanted = {str(v) for v in f.value}
            else:
                yield f
                continue
            self._batch_ids = (
                wanted if self._batch_ids is None else self._batch_ids & wanted
            )
            yield f  # conservative: Spark re-evaluates it post-scan


class _BatchFileStreamReader(SimpleDataSourceStreamReader):
    """Streaming discovery of batch files — the reference's raw-vs-
    processed directory diff (S14/T5, ``src/training_service.py:
    305-341``) replaced by a checkpointed offset: the lexicographically
    LAST file name consumed. Relies on the reference's own naming
    convention (``batch_XXXXXX_<ts>.json`` — monotonic), which is what
    made its sorted-name processing order correct in the first place.
    Exactly-once within the checkpoint horizon, no marker copies."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("recbatch source requires a 'path' option")
        self._dir = path

    def _files_after(self, last: str, upto: str | None = None) -> list[str]:
        names = sorted(
            f for f in os.listdir(self._dir) if f.endswith(".json") and f > last
        )
        if upto is not None:
            names = [f for f in names if f <= upto]
        return names

    def initialOffset(self) -> dict:
        return {"last": ""}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        files = self._files_after(start["last"])
        if not files:
            return iter([]), start
        # a list_iterator, not a generator: the engine's prefetch cache
        # both next()s and copy.copy()s what read() returns — generators
        # aren't copyable, bare lists aren't iterators
        rows = [
            row
            for f in files
            for row in _read_blob(os.path.join(self._dir, f))
        ]
        return iter(rows), {"last": files[-1]}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for f in self._files_after(start["last"], upto=end["last"]):
            yield from _read_blob(os.path.join(self._dir, f))

    def commit(self, end: dict) -> None:
        pass  # no external cleanup; the offset is the whole state


class _BatchFileCommit(WriterCommitMessage):
    def __init__(self, files: list[str]):
        self.files = files


class _BatchFileWriter(DataSourceWriter):
    """Writes rows of :data:`BATCH_INTERACTION_SCHEMA` back into the
    reference's one-JSON-per-batch format: one file per (batch_id,
    partition). Repartition by ``batch_id`` first if a batch must land
    in a single file. Append-only — the format has no atomic overwrite,
    and the reference's consumers treat files as immutable once named."""

    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("recbatch sink requires a 'path' option")
        self._dir = path

    def write(self, iterator) -> _BatchFileCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        attempt = ctx.taskAttemptId()
        groups: dict[str, list] = {}
        batch_ts: dict[str, str] = {}
        for row in iterator:
            groups.setdefault(row["batch_id"], []).append(
                {
                    "user_id": row["user_id"],
                    "track_id": row["track_id"],
                    "rating": row["rating"],
                    "action": row["action"],
                    "play_duration_ms": row["play_duration_ms"],
                    "timestamp": row["ts"].isoformat() if row["ts"] else None,
                }
            )
            if row["batch_ts"] is not None:
                batch_ts[row["batch_id"]] = row["batch_ts"].isoformat()
        os.makedirs(self._dir, exist_ok=True)
        files = []
        for batch_id, interactions in sorted(groups.items()):
            name = f"{batch_id}_p{pid:05d}.json"
            blob = {
                "batch_id": batch_id,
                "timestamp": batch_ts.get(batch_id),
                "size": len(interactions),
                "interactions": interactions,
            }
            # temp-then-rename: a speculative/retried attempt of this
            # partition writing the same final name concurrently must
            # never interleave into corrupt JSON. The temp name carries
            # the task attempt id (unique per attempt); os.replace is
            # atomic on POSIX, so readers only ever see complete files
            # and the last finishing attempt wins with identical bytes.
            tmp = os.path.join(self._dir, f".{name}.tmp-{attempt}")
            with open(tmp, "w") as fh:
                json.dump(blob, fh)
            os.replace(tmp, os.path.join(self._dir, name))
            files.append(name)
        return _BatchFileCommit(files)

    def commit(self, messages) -> None:
        pass  # files became final atomically in write()

    def abort(self, messages) -> None:
        # messages only cover successful tasks; failed attempts may
        # have left .{name}.tmp-{attempt} orphans — sweep those too.
        for m in messages:
            if m is not None:
                for f in m.files:
                    try:
                        os.remove(os.path.join(self._dir, f))
                    except OSError:
                        pass
        try:
            for f in os.listdir(self._dir):
                if f.startswith(".") and ".tmp-" in f:
                    try:
                        os.remove(os.path.join(self._dir, f))
                    except OSError:
                        pass
        except OSError:
            pass


class BatchFileDataSource(DataSource):
    """``format("recbatch")`` — flattened reference batch files, batch
    and streaming (file-discovery) variants."""

    @classmethod
    def name(cls) -> str:
        return "recbatch"

    def schema(self) -> T.StructType:
        return BATCH_INTERACTION_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        if str(self.options.get("pushdown", "true")).lower() == "false":
            return _BatchFileReader(self.options)
        return _BatchFileReaderWithPushdown(self.options)

    def simpleStreamReader(self, schema: T.StructType) -> SimpleDataSourceStreamReader:
        return _BatchFileStreamReader(self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            raise ValueError(
                "recbatch sink is append-only (the format has no atomic "
                "overwrite; reference consumers treat batch files as immutable)"
            )
        return _BatchFileWriter(self.options)
