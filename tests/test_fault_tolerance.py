"""Task-retry fault tolerance: Spark's scheduler replaces the
reference's Prefect `retries=2` (`/root/reference/pipeline.py:40`).

SURVEY §4 claims `spark.task.maxFailures` subsumes the reference's
per-subject retry decorator; this proves it end-to-end: a mapInPandas
stage whose tasks fail on their FIRST attempt (transient-fault
simulation via an attempt marker on disk) must still complete the job
and produce every row, because the scheduler reruns failed tasks.

Needs its own JVM: task retries require `local[N, maxFailures]` at
SparkContext creation, and the shared test session runs with the
default (fail-fast) master — so this runs as a subprocess.
"""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import os, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

marker_dir = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2, 2]")
    .appName("retry-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

def flaky(batches):
    # One marker per partition-attempt: first attempt dies, retry runs.
    from pyspark import TaskContext

    ctx = TaskContext.get()
    marker = os.path.join(marker_dir, f"p{ctx.partitionId()}")
    if not os.path.exists(marker):
        open(marker, "w").close()
        raise RuntimeError("simulated transient fault (first attempt)")
    for pdf in batches:
        yield pdf

df = spark.range(100, numPartitions=4).mapInPandas(flaky, schema="id long")
rows = df.count()
attempts = len(os.listdir(marker_dir))
assert rows == 100, rows
assert attempts == 4, attempts  # every partition failed exactly once
print("OK", rows, attempts)
"""


def test_task_retry_completes_job(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "OK 100 4" in out.stdout, (out.stdout[-2000:], out.stderr[-2000:])
