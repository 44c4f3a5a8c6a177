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
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Iterator
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class ShardsCommit(WriterCommitMessage):
    files: list = field(default_factory=list)  # [(staging_path, rows)]


def _write_partition(
    iterator: Iterator, staging: str, schema: StructType, max_records: int
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
                staging, f"t{task:05d}-a{attempt:06d}-{seq:03d}.jsonl"
            )
            fh = open(path, "w")
            count, seq = 0, seq + 1
        d = dict(zip(names, row))
        fh.write(json.dumps(d, default=str) + "\n")
        count += 1
    if fh is not None:
        fh.close()
        files.append((path, count))
    return ShardsCommit(files=files)


def _publish(out_dir: str, messages, overwrite: bool) -> None:
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
            if n.endswith(".jsonl") or n == "_MANIFEST.json":
                os.remove(os.path.join(out_dir, n))
    os.makedirs(out_dir, exist_ok=True)
    prior: list[dict] = []
    start = 0
    if not overwrite:
        mpath = os.path.join(out_dir, "_MANIFEST.json")
        existing_shards = [
            n for n in os.listdir(out_dir)
            if n.startswith("shard-") and n.endswith(".jsonl")
        ]
        if os.path.exists(mpath):
            with open(mpath) as f:
                prior = json.load(f)["shards"]
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
        name = f"shard-{i:05d}.jsonl"
        os.replace(src, os.path.join(out_dir, name))
        manifest.append({"shard": name, "rows": rows})
    # The manifest lands LAST: its presence is the commit marker.
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump({"shards": manifest, "total_rows": sum(m["rows"] for m in manifest)}, f)


def _cleanup(staging: str) -> None:
    shutil.rmtree(staging, ignore_errors=True)


class JsonlShardsWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlshards requires a path: .save('/dir')")
        self.max_records = int(options.get("max_records_per_file", "10000"))
        self.schema = schema
        self.overwrite = overwrite
        self.staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")

    def write(self, iterator: Iterator) -> ShardsCommit:
        return _write_partition(iterator, self.staging, self.schema, self.max_records)

    def commit(self, messages) -> None:
        _publish(self.path, messages, self.overwrite)
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
        self.staging = os.path.join(self.path, f"_staging_{uuid.uuid4().hex}")

    def write(self, iterator: Iterator) -> ShardsCommit:
        return _write_partition(iterator, self.staging, self.schema, self.max_records)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        _publish(os.path.join(self.path, f"batch={batchId}"), messages, True)
        _cleanup(self.staging)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _cleanup(self.staging)


class JsonlShardsDataSource(DataSource):
    """``format("jsonlshards")``: the two-phase-commit shard sink."""

    @classmethod
    def name(cls) -> str:
        return "jsonlshards"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlShardsWriter:
        return JsonlShardsWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> JsonlShardsStreamWriter:
        return JsonlShardsStreamWriter(self.options, schema, overwrite)
