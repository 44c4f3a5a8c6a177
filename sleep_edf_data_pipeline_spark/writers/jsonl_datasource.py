"""JSONL training shards as a first-class Spark sink (Python Data
Source API) with a real two-phase commit.

``writers/corpus_export.py`` shards through Spark's built-in JSON
writer; this elevates the shard contract itself —

* deterministic shard names ``shard-00000.jsonl`` … (downstream
  loaders address shards by index for resume/retry),
* a ``_MANIFEST.json`` naming every shard with its row count (the
  audit a training run consumes), written ONLY after all tasks
  succeed,

— into a ``format("jsonlshards")`` sink whose atomicity is the
writer's own two-phase commit: tasks write to a hidden staging
directory and return commit messages; the driver's ``commit()``
publishes staging files under their final names and writes the
manifest last; ``abort()`` removes staging so a failed job leaves no
visible output.  This is the same stage-then-publish protocol as
writers/versioned.py, expressed through the engine's writer lifecycle
(Spark collects the per-task messages and drives commit/abort).

Batch and streaming: ``df.write.format("jsonlshards")`` and
``df.writeStream.format("jsonlshards")`` (per-micro-batch manifests
under ``batch=<id>/`` — the idempotent-by-batch-id contract of
exactly-once file sinks).

And back: ``spark.read.format("jsonlshards").load(dir)`` reads a
committed directory with the schema the manifest recorded (no user
schema needed), one scan partition per shard, ignoring anything the
manifest doesn't list — so a torn write is unreadable rather than
half-read.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import uuid
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

#: Manifest wire-format version.  v1 (no marker) serialized binary
#: columns as Python ``repr`` text; v2 uses base64.  Non-binary
#: columns are byte-identical across the two, so v1 shards only
#: become unreadable when the schema actually contains BINARY —
#: enforced at read/append time instead of silently b64-decoding
#: repr garbage.
FORMAT_VERSION = 2


def _schema_has_binary(dt) -> bool:
    name = dt.typeName()
    if name == "binary":
        return True
    if name == "array":
        return _schema_has_binary(dt.elementType)
    if name == "map":
        return _schema_has_binary(dt.keyType) or _schema_has_binary(
            dt.valueType
        )
    if name == "struct":
        return any(_schema_has_binary(f.dataType) for f in dt.fields)
    return False


def _check_binary_readable(manifest: dict, schema, path: str) -> None:
    """Refuse to b64-decode shards written by the pre-base64 writer."""
    if manifest.get("format_version", 1) < 2 and _schema_has_binary(schema):
        raise ValueError(
            f"jsonlshards: {path} was written by a pre-v2 writer (no "
            "format_version in its manifest) and the schema contains a "
            "BINARY column, which v1 serialized as Python repr text — "
            "rewrite the shards with the current writer to read them"
        )


@dataclass
class ShardsCommit(WriterCommitMessage):
    files: list = field(default_factory=list)  # [(staging_path, rows)]


def _open_shard(path: str, mode: str):
    return gzip.open(path, mode + "t") if path.endswith(".gz") else open(path, mode)


def _write_partition(
    iterator: Iterator,
    staging: str,
    schema: StructType,
    max_records: int,
    ext: str = ".jsonl",
) -> ShardsCommit:
    """Write one task's rows into size-bounded staging files."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    task = ctx.partitionId() if ctx else 0
    # Attempt id in the staging name: with speculative execution (or a
    # zombie first attempt) two attempts of the same partition write
    # concurrently — per-attempt files mean only the attempt whose
    # commit message wins is ever published, never an interleaving.
    attempt = ctx.taskAttemptId() if ctx else 0
    os.makedirs(staging, exist_ok=True)
    files: list[tuple[str, int]] = []
    fh, count, seq, path = None, 0, 0, ""
    names = schema.fieldNames()
    for row in iterator:
        if fh is None or count >= max_records:
            if fh is not None:
                fh.close()
                files.append((path, count))
            path = os.path.join(
                staging, f"t{task:05d}-a{attempt:06d}-{seq:03d}{ext}"
            )
            fh = _open_shard(path, "w")
            count, seq = 0, seq + 1
        d = dict(zip(names, row))
        fh.write(json.dumps(d, default=_json_default) + "\n")
        count += 1
    if fh is not None:
        fh.close()
        files.append((path, count))
    return ShardsCommit(files=files)


def _publish(
    out_dir: str, messages, overwrite: bool, schema_json: str | None = None
) -> None:
    """Driver-side commit: staging → deterministic names + manifest.

    Overwrite mode clears prior shards; append mode CONTINUES shard
    numbering after the existing manifest's highest index and merges
    the manifest, so a second append never clobbers earlier shards.
    Appending into a directory that has shards but no manifest (an
    uncommitted or foreign state) is refused rather than guessed at.
    """
    staged: list[tuple[str, int]] = []
    for m in messages:
        if m is not None:
            staged.extend(m.files)
    staged.sort()  # deterministic shard numbering by (task, attempt, seq)
    if overwrite and os.path.isdir(out_dir):
        for n in os.listdir(out_dir):
            if n.endswith((".jsonl", ".jsonl.gz")) or n == "_MANIFEST.json":
                os.remove(os.path.join(out_dir, n))
    os.makedirs(out_dir, exist_ok=True)
    prior: list[dict] = []
    start = 0
    if not overwrite:
        mpath = os.path.join(out_dir, "_MANIFEST.json")
        existing_shards = [
            n for n in os.listdir(out_dir)
            if n.startswith("shard-") and n.endswith((".jsonl", ".jsonl.gz"))
        ]
        if os.path.exists(mpath):
            with open(mpath) as f:
                prior_manifest = json.load(f)
            prior = prior_manifest["shards"]
            prior_schema = prior_manifest.get("schema")
            if schema_json is not None:
                _check_binary_readable(
                    prior_manifest,
                    StructType.fromJson(json.loads(schema_json)),
                    out_dir,
                )
            if (
                schema_json is not None
                and prior_schema is not None
                and prior_schema != schema_json
            ):
                raise ValueError(
                    f"jsonlshards: append schema does not match {out_dir}'s "
                    "manifest schema; use mode('overwrite') to replace"
                )
            indices = [int(s["shard"][6:11]) for s in prior]
            start = max(indices, default=-1) + 1
        elif existing_shards:
            raise ValueError(
                f"jsonlshards: refusing to append into {out_dir}: it has "
                "shard files but no _MANIFEST.json (uncommitted or foreign "
                "output); use mode('overwrite') or clean the directory"
            )
    manifest = list(prior)
    for i, (src, rows) in enumerate(staged, start=start):
        ext = ".jsonl.gz" if src.endswith(".gz") else ".jsonl"
        name = f"shard-{i:05d}{ext}"
        os.replace(src, os.path.join(out_dir, name))
        manifest.append({"shard": name, "rows": rows})
    # The manifest lands LAST: its presence is the commit marker.  The
    # schema rides in it so reads are self-describing.
    payload = {
        "format_version": FORMAT_VERSION,
        "shards": manifest,
        "total_rows": sum(m["rows"] for m in manifest),
    }
    if schema_json is not None:
        payload["schema"] = schema_json
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(payload, f)


def _cleanup(staging: str) -> None:
    shutil.rmtree(staging, ignore_errors=True)


def _shard_ext(options: dict) -> str:
    """``compression`` option → shard filename extension."""
    comp = (options.get("compression") or "none").lower()
    if comp in ("none", "uncompressed"):
        return ".jsonl"
    if comp == "gzip":
        return ".jsonl.gz"
    raise ValueError(f"jsonlshards: unsupported compression {comp!r}")


class JsonlShardsWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlshards requires a path: .save('/dir')")
        self.max_records = int(options.get("max_records_per_file", "10000"))
        self.schema = schema
        self.overwrite = overwrite
        self.ext = _shard_ext(options)
        self.staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")

    def write(self, iterator: Iterator) -> ShardsCommit:
        return _write_partition(
            iterator, self.staging, self.schema, self.max_records, self.ext
        )

    def commit(self, messages) -> None:
        _publish(self.path, messages, self.overwrite, self.schema.json())
        _cleanup(self.staging)

    def abort(self, messages) -> None:
        _cleanup(self.staging)


class JsonlShardsStreamWriter(DataSourceStreamWriter):
    """Per-micro-batch shard publication: ``batch=<id>/`` + manifest.

    Re-running a batch id (failure recovery) republishes the same
    directory — commit is idempotent by batch id, the file-sink
    exactly-once contract.
    """

    def __init__(self, options: dict, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlshards requires a path")
        self.max_records = int(options.get("max_records_per_file", "10000"))
        self.schema = schema
        self.ext = _shard_ext(options)
        self.staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")

    def write(self, iterator: Iterator) -> ShardsCommit:
        return _write_partition(
            iterator, self.staging, self.schema, self.max_records, self.ext
        )

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        _publish(
            os.path.join(self.path, f"batch={batchId}"),
            messages,
            True,
            self.schema.json(),
        )
        _cleanup(self.staging)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _cleanup(self.staging)


def _load_manifest(path: str) -> dict:
    mpath = os.path.join(path, "_MANIFEST.json")
    if not os.path.exists(mpath):
        raise ValueError(
            f"jsonlshards: {path} has no _MANIFEST.json — not a committed "
            "shard directory (the manifest is the commit marker)"
        )
    with open(mpath) as f:
        return json.load(f)


def _json_default(v):
    """Non-native JSON types on the write path: bytes → base64 text
    (str(b'..') would emit an unreadable repr), Decimal/temporals →
    str (lossless decimal text / ISO format, both re-parsed by
    ``_converter``)."""
    import base64

    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    return str(v)


def _converter(dt):
    """JSON value → Spark external type for one field (writer inverse).

    The writer serializes with ``json.dumps(default=_json_default)``,
    so temporals arrive as ISO-ish strings, decimals as decimal text,
    binary as base64; everything else is a native JSON scalar/array.
    Nested structs come back as dicts → Rows.
    """
    import base64
    import datetime
    import decimal

    name = dt.typeName()
    if name == "decimal":
        return lambda v: decimal.Decimal(v)
    if name == "binary":
        return lambda v: base64.b64decode(v)
    if name in ("integer", "long", "short", "byte"):
        return lambda v: int(v)
    if name in ("double", "float"):
        return lambda v: float(v)
    if name == "boolean":
        return lambda v: bool(v)
    if name == "string":
        return lambda v: str(v)
    if name == "date":
        return lambda v: datetime.date.fromisoformat(v)
    if name in ("timestamp", "timestamp_ntz"):
        return lambda v: datetime.datetime.fromisoformat(v)
    if name == "array":
        elem = _converter(dt.elementType)
        return lambda v: [None if x is None else elem(x) for x in v]
    if name == "struct":
        convs = [(f.name, _converter(f.dataType)) for f in dt.fields]
        return lambda v: tuple(
            None if v.get(n) is None else c(v.get(n)) for n, c in convs
        )
    return lambda v: v


class ShardPartition(InputPartition):
    def __init__(self, shard_path: str) -> None:
        self.shard_path = shard_path


class JsonlShardsReader(DataSourceReader):
    """Manifest-driven parallel read with row-level filter pushdown.

    One input partition per shard — the parallelism the writer chose
    (size-bounded shards) is the parallelism the scan gets, and only
    manifest-listed shards are read (a torn write's stray staging
    files are invisible).

    Deliberately NO ``pushFilters``: Spark caches the last planned
    (read function, partitions) for a loaded frame's relation and
    reuses it for later queries on the same frame WITHOUT re-invoking
    pushdown planning — a filterless query after a filtered one would
    silently replay the previous query's pushed predicates (verified
    against pyspark 4.1: bare ``df.count()`` after ``df.filter(...)
    .count()`` returns the filtered count when the reader implements
    pushFilters).  Filters therefore stay JVM-side, where they belong
    until the scan-reuse is keyed by filter set.
    """

    def __init__(self, options: dict, schema: StructType) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlshards requires a path: .load('/dir')")
        if os.path.exists(os.path.join(self.path, "_MANIFEST.json")):
            manifest = _load_manifest(self.path)
            _check_binary_readable(manifest, schema, self.path)
            self.shards = [s["shard"] for s in manifest["shards"]]
        else:
            # streaming layout: batch-read = union of committed batches
            ids = _committed_batches(self.path)
            if not ids:
                _load_manifest(self.path)  # raises the standard error
            self.shards = []
            for b in ids:
                bdir = os.path.join(self.path, f"batch={b}")
                m = _load_manifest(bdir)
                _check_binary_readable(m, schema, bdir)
                self.shards.extend(
                    os.path.join(f"batch={b}", s["shard"])
                    for s in m["shards"]
                )
        self.schema = schema

    def partitions(self) -> list[ShardPartition]:
        return [
            ShardPartition(os.path.join(self.path, s)) for s in self.shards
        ]

    def read(self, partition: ShardPartition) -> Iterator[tuple]:
        return self.parse_shard(partition.shard_path, self.schema)

    @staticmethod
    def parse_shard(shard_path: str, schema: StructType) -> Iterator[tuple]:
        fields = [(f.name, _converter(f.dataType)) for f in schema.fields]
        with _open_shard(shard_path, "r") as fh:
            for line in fh:
                if not line.strip():
                    continue
                d = json.loads(line)
                yield tuple(
                    None if d.get(n) is None else conv(d.get(n))
                    for n, conv in fields
                )


def _committed_batches(path: str) -> list[int]:
    """Batch ids under ``path`` whose manifest (commit marker) landed."""
    if not os.path.isdir(path):
        return []
    ids = []
    for n in os.listdir(path):
        if n.startswith("batch=") and os.path.exists(
            os.path.join(path, n, "_MANIFEST.json")
        ):
            ids.append(int(n[6:]))
    return sorted(ids)


class JsonlShardsStreamReader(DataSourceStreamReader):
    """Stream a shard directory's ``batch=<id>/`` tree back out.

    The inverse of :class:`JsonlShardsStreamWriter`: each committed
    upstream micro-batch becomes (part of) a downstream micro-batch —
    the manifest-lands-last protocol means a batch directory is either
    invisible or complete, never half-read.  Offsets are ``{"next":
    id}`` over the sorted committed ids; ``partitions(start, end)`` is
    deterministic for a fixed range because manifests are immutable,
    which is what replay-after-restart needs.  Reads run on executors
    (full ``DataSourceStreamReader``, not the driver-side Simple
    variant) with one task per shard.
    """

    def __init__(self, options: dict, schema: StructType) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlshards requires a path")
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        ids = _committed_batches(self.path)
        return {"next": (ids[-1] + 1) if ids else 0}

    def partitions(self, start: dict, end: dict) -> list[ShardPartition]:
        parts = []
        for b in _committed_batches(self.path):
            if start["next"] <= b < end["next"]:
                bdir = os.path.join(self.path, f"batch={b}")
                manifest = _load_manifest(bdir)
                _check_binary_readable(manifest, self.schema, bdir)
                parts.extend(
                    ShardPartition(os.path.join(bdir, s["shard"]))
                    for s in manifest["shards"]
                )
        # Spark requires a non-empty partition list; an empty range
        # reads an empty shard-less partition.
        return parts or [ShardPartition("")]

    def read(self, partition: ShardPartition) -> Iterator[tuple]:
        if not partition.shard_path:
            return iter(())
        return JsonlShardsReader.parse_shard(partition.shard_path, self.schema)

    def commit(self, end: dict) -> None:
        pass  # progress is checkpoint-tracked by the engine


class JsonlShardsDataSource(DataSource):
    """``format("jsonlshards")``: two-phase-commit shard sink + source.

    Write: ``df.write.format("jsonlshards").save(dir)`` (batch or
    stream).  Read: ``spark.read.format("jsonlshards").load(dir)`` —
    schema comes from the manifest the committed write recorded, so
    the round-trip needs no user schema.
    """

    @classmethod
    def name(cls) -> str:
        return "jsonlshards"

    def schema(self) -> StructType:
        path = self.options.get("path", "")
        if not os.path.exists(os.path.join(path, "_MANIFEST.json")):
            # streaming layout: take the earliest committed batch's
            # manifest (all batches share the writer's schema)
            ids = _committed_batches(path)
            if ids:
                path = os.path.join(path, f"batch={ids[0]}")
        manifest = _load_manifest(path)
        schema_json = manifest.get("schema")
        if schema_json is None:
            raise ValueError(
                "jsonlshards: manifest predates schema recording; pass "
                ".schema(...) explicitly"
            )
        return StructType.fromJson(json.loads(schema_json))

    def reader(self, schema: StructType) -> JsonlShardsReader:
        return JsonlShardsReader(self.options, schema)

    def streamReader(self, schema: StructType) -> JsonlShardsStreamReader:
        return JsonlShardsStreamReader(self.options, schema)

    def writer(self, schema: StructType, overwrite: bool) -> JsonlShardsWriter:
        return JsonlShardsWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> JsonlShardsStreamWriter:
        return JsonlShardsStreamWriter(self.options, schema, overwrite)
