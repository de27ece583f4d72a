"""Custom Python DataSource (Spark 4 DataSource API): deterministic
synthetic event generation and Java-properties config ingestion.

The reference ingests from exactly two custom source families — Kafka
topics and Kafka Connect config-driven connectors (spool-dir CSV,
MySQL JDBC; ``src/main/resources/*-kafka-connect-source.properties``).
This module re-expresses "bring your own source" the Spark-4-native
way: a ``pyspark.sql.datasource.DataSource`` subclass registered with
``spark.dataSource.register`` whose reads are PARTITION-PARALLEL —
``partitions()`` declares the split, executors call ``read(partition)``
independently, so the source scales out like any built-in scan.

Two sources:

- ``synthetic_events`` — a deterministic event generator (the
  load-generator role ``ProducerKafa_Prod.scala:60-93`` plays for the
  reference, minus Kafka): every field derives from the portable
  md5-prefix hash of the row id, so the SAME rows materialize for any
  partition count, any engine — DuckDB replays the generator from
  ``generate_series``, giving the read path a full value oracle.
- ``java_properties`` — reads ``key=value`` config files (the
  reference's connector-config format) into (file, key, value) rows;
  comments / blank lines / ``key: value`` and line-continuation
  syntax per ``java.util.Properties``.

Arrow note: rows are yielded as plain tuples (the API's simple form).
For a bulk source you would yield ``pyarrow.RecordBatch`` instead —
``read()`` supports both — but these two sources are demonstration /
config-scale; the batch form is exercised in the multimodal operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = [
    "SyntheticEventsDataSource",
    "SyntheticEventsStreamDataSource",
    "JavaPropertiesDataSource",
    "register_python_sources",
]

_EVENT_TYPES = ("view", "click", "purchase", "signup", "share")


def _h60(key: str, salt: str) -> int:
    """Python twin of operators/sampling._portable_hash (and of the
    DuckDB md5-prefix idiom): first 15 hex chars of md5 → 60-bit int."""
    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:15], 16)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = max(1, int(options.get("partitions", "4")))

    def partitions(self) -> Sequence[InputPartition]:
        if self.n_rows <= 0:
            # .option("rows", "0") is an empty relation, not a crash
            # (per would be 0 and range() rejects a zero step)
            return [_RangePartition(0, 0)]
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _RangePartition(lo, min(lo + per, self.n_rows))
            for lo in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        return _event_rows(partition.start, partition.end)


def _event_rows(start: int, end: int) -> Iterator[tuple]:
    """The deterministic generator itself — shared verbatim by the
    batch reader and the streaming reader so the stream's union of
    micro-batches is bit-equal to one batch read (pinned by test)."""
    for i in range(start, end):
        uid = _h60(str(i), "sy-u") % 500
        etype = _EVENT_TYPES[_h60(str(i), "sy-e") % len(_EVENT_TYPES)]
        # integer centi-units: exact in any engine, summed as BIGINT
        value_c = _h60(str(i), "sy-v") % 1_000_000
        yield (i, f"u{uid:03d}", etype, value_c)


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)
    .option("partitions", P).load()`` — N deterministic events split
    across P independent input partitions."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id string, event_type string, value_c bigint"

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)


def parse_properties(text: str) -> list[tuple[str, str]]:
    """Minimal ``java.util.Properties`` parser: ``#``/``!`` comments,
    ``=`` / ``:`` / whitespace separators (the key ends at the first
    unescaped one; an optional single ``=``/``:`` after the key is
    consumed, so ``key value``, ``key = value``, ``key:value`` all
    parse alike), backslash escapes in keys, and line continuation
    (a line ending in an ODD number of backslashes — an even count is
    escaped literal backslashes, not a continuation).  Values are
    taken literally after whitespace-trim (no escape processing —
    the "minimal" part).  Pure function so the parse is unit-testable
    without Spark."""
    out: list[tuple[str, str]] = []
    pending = ""
    for raw in text.splitlines():
        line = pending + raw.strip()
        pending = ""
        if not line or line[0] in "#!":
            continue
        n_trailing = len(line) - len(line.rstrip("\\"))
        if n_trailing % 2 == 1:
            pending = line[:-1]
            continue
        key_chars: list[str] = []
        i, n = 0, len(line)
        while i < n:
            c = line[i]
            if c == "\\" and i + 1 < n:
                key_chars.append(line[i + 1])
                i += 2
                continue
            if c in "=:" or c.isspace():
                break
            key_chars.append(c)
            i += 1
        while i < n and line[i].isspace():
            i += 1
        if i < n and line[i] in "=:":
            i += 1
            while i < n and line[i].isspace():
                i += 1
        out.append(("".join(key_chars), line[i:].strip()))
    if pending:
        out.append((pending.strip(), ""))
    return out


class _PropertiesReader(DataSourceReader):
    def __init__(self, options):
        paths = options.get("paths") or options.get("path", "")
        self.paths = [p for p in paths.split(",") if p]

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per file: config files are tiny; parallelism
        # across files is the right grain
        return [InputPartition(p) for p in self.paths]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        path = partition.value
        with open(path, encoding="utf-8") as fh:
            for key, value in parse_properties(fh.read()):
                yield (path, key, value)


class JavaPropertiesDataSource(DataSource):
    """``spark.read.format("java_properties").option("paths",
    "a.properties,b.properties").load()`` → (file, key, value)."""

    @classmethod
    def name(cls) -> str:
        return "java_properties"

    def schema(self) -> str:
        return "file string, key string, value string"

    def reader(self, schema) -> DataSourceReader:
        return _PropertiesReader(self.options)


class _SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked micro-batch reader over the same deterministic
    generator: the offset is simply the next row id, so the engine's
    offset log (checkpoint) gives exactly-once row delivery for free
    and `readBetweenOffsets` replays any committed range
    bit-identically after a restart."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", "100"))
        self.max_rows = int(options.get("max_rows", "1000"))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.batch_rows, self.max_rows)
        # a LIST ITERATOR, not a bare generator: the prefetch cache
        # pickles the rows for executor replay (generators can't
        # pickle) AND calls next() to probe emptiness when the offset
        # stops advancing (bare lists aren't iterators) — iter(list)
        # satisfies both sides of the simple-reader protocol
        return iter(list(_event_rows(lo, hi))), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_event_rows(int(start["pos"]), int(end["pos"]))))


class SyntheticEventsStreamDataSource(DataSource):
    """``spark.readStream.format("synthetic_events_stream")
    .option("batch_rows", B).option("max_rows", N).load()`` — the
    STREAMING face of the generator (Spark 4
    ``SimpleDataSourceStreamReader``): each micro-batch advances the
    row-id offset by ``batch_rows`` until ``max_rows``, after which
    the offset stops moving (an ``availableNow`` run terminates; a
    continuous run idles).  Row values are the batch source's
    generator verbatim, so stream == batch is pinned by test."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return (
            "event_id bigint, user_id string, event_type string,"
            " value_c bigint"
        )

    def simpleStreamReader(self, schema):
        return _SyntheticEventsStreamReader(self.options)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_name: str, n_rows: int, sha256: str):
        self.tmp_name = tmp_name
        self.n_rows = n_rows
        self.sha256 = sha256


class _JsonlShardsWriter(DataSourceWriter):
    """Task side of the two-phase commit: each task streams its rows
    into a UUID-named temp file and reports (name, rows, sha256) in
    its commit message; nothing under the final names exists until
    the driver's commit()."""

    def __init__(self, path: str, overwrite: bool):
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator):
        import hashlib
        import json
        import os
        import uuid

        tmp_dir = os.path.join(self.path, "_tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        name = f"{uuid.uuid4().hex}.jsonl"
        h = hashlib.sha256()
        n = 0
        with open(os.path.join(tmp_dir, name), "wb") as f:
            for row in iterator:
                line = (
                    json.dumps(
                        row.asDict(recursive=True),
                        sort_keys=True,
                        default=str,
                    )
                    + "\n"
                ).encode("utf-8")
                f.write(line)
                h.update(line)
                n += 1
        return _JsonlCommit(name, n, h.hexdigest())

    def commit(self, messages) -> None:
        import json
        import os

        tmp_dir = os.path.join(self.path, "_tmp")
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("shard-") or f == "_MANIFEST.json":
                    os.remove(os.path.join(self.path, f))
        shards = []
        for i, m in enumerate(
            sorted(messages, key=lambda m: m.tmp_name)
        ):
            final = f"shard-{i:05d}.jsonl"
            os.replace(
                os.path.join(tmp_dir, m.tmp_name),
                os.path.join(self.path, final),
            )
            shards.append(
                {"file": final, "rows": m.n_rows, "sha256": m.sha256}
            )
        manifest = {
            "shards": shards,
            "total_rows": sum(s["rows"] for s in shards),
        }
        tmp_manifest = os.path.join(tmp_dir, "_MANIFEST.json.tmp")
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp_manifest, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages) -> None:
        import os

        tmp_dir = os.path.join(self.path, "_tmp")
        for m in messages:
            try:
                os.remove(os.path.join(tmp_dir, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlShardsDataSource(DataSource):
    """Writable custom Python DataSource (Spark 4 DataSource API write
    path): JSONL shards with a two-phase file commit and a manifest.

    Write protocol (the exactly-once contract FileOutputCommitter
    gives parquet, expressed in the public Python API): every task
    writes a temp shard and returns a commit message; the DRIVER's
    ``commit`` renames temps to ``shard-NNNNN.jsonl`` and publishes
    ``_MANIFEST.json`` (per-shard rows + sha256, total rows) LAST, so
    a reader that requires the manifest never sees a torn write; on
    task failure/retry ``abort`` removes the orphan temps, and an
    uncommitted temp is invisible to readers regardless.  Overwrite
    clears previously committed shards at commit time, not before —
    a failed overwrite leaves the old data intact.

    Read path: one InputPartition per manifest shard (partition-
    parallel), rows parsed per the user-supplied schema.  Renames are
    driver-side POSIX ops — single-filesystem semantics, the same
    assumption the versioned-table sink documents.
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool):
        return _JsonlShardsWriter(self.options["path"], overwrite)

    def reader(self, schema) -> DataSourceReader:
        return _JsonlShardsReader(self.options["path"], schema)

    def streamWriter(self, schema, overwrite: bool):
        return _JsonlStreamWriter(self.options["path"])


class _JsonlStreamWriter(DataSourceStreamWriter):
    """Streaming twin of the batch writer: every micro-batch's task
    temps are published under ``batch_id=N/`` by the driver's
    per-batch commit, which CLEARS any prior content of that batch
    directory first — so an at-least-once redelivery restates the
    batch instead of appending duplicates (the module-wide
    restatement rule, here at the custom-sink layer).  The engine's
    checkpoint supplies the batchId; the sink itself stays
    stateless."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator):
        return _JsonlShardsWriter(self.path, overwrite=False).write(
            iterator
        )

    def commit(self, messages, batchId: int) -> None:
        import os
        import shutil

        tmp_dir = os.path.join(self.path, "_tmp")
        batch_dir = os.path.join(self.path, f"batch_id={int(batchId)}")
        if os.path.isdir(batch_dir):
            shutil.rmtree(batch_dir)
        os.makedirs(batch_dir)
        for i, m in enumerate(
            sorted(
                (m for m in messages if m is not None),
                key=lambda m: m.tmp_name,
            )
        ):
            os.replace(
                os.path.join(tmp_dir, m.tmp_name),
                os.path.join(batch_dir, f"shard-{i:05d}.jsonl"),
            )

    def abort(self, messages, batchId: int) -> None:
        import os

        tmp_dir = os.path.join(self.path, "_tmp")
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(tmp_dir, m.tmp_name))
            except FileNotFoundError:
                pass


class _ShardPartition(InputPartition):
    def __init__(self, filename: str):
        self.filename = filename


class _JsonlShardsReader(DataSourceReader):
    def __init__(self, path: str, schema):
        self.path = path
        self.schema = schema

    def partitions(self):
        import json
        import os

        with open(os.path.join(self.path, "_MANIFEST.json")) as f:
            manifest = json.load(f)
        return [_ShardPartition(s["file"]) for s in manifest["shards"]]

    def read(self, partition):
        import json
        import os

        names = [f.name for f in self.schema.fields]
        with open(os.path.join(self.path, partition.filename)) as f:
            for line in f:
                d = json.loads(line)
                yield tuple(d.get(n) for n in names)


def register_python_sources(spark) -> None:
    """Idempotent registration of the sources on a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(SyntheticEventsStreamDataSource)
    spark.dataSource.register(JavaPropertiesDataSource)
    spark.dataSource.register(JsonlShardsDataSource)
