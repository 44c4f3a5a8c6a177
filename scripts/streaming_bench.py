"""Streaming throughput bench: drain sf0.1 through each streaming op.

Batch bench (bench.py) covers the relational/corpus surface; this
measures the Structured Streaming operators' sustained throughput —
rows drained per second across multiple micro-batches (file source,
``maxFilesPerTrigger`` forces real batch boundaries so state actually
crosses them), full availableNow drain to a memory sink.

Usage: python scripts/streaming_bench.py [out.json]
Writes STREAMING_BENCH.json {query: {wall_s, rows_in, rows_out,
rows_per_sec, micro_batches}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.operators.dedup import with_minhash
from sleep_edf_data_pipeline_spark.session import get_spark
from sleep_edf_data_pipeline_spark.streaming.dedup import (
    streaming_exact_dedup,
    streaming_lsh_admission,
)
from sleep_edf_data_pipeline_spark.streaming.sessions import (
    streaming_hourly_counts,
    streaming_sessions,
)
from sleep_edf_data_pipeline_spark.streaming.stateful import streaming_episodes
from sleep_edf_data_pipeline_spark.tables import table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
STAGE = "/tmp/stream_bench_src"
N_FILES = 20
FILES_PER_TRIGGER = 4


def stage(spark) -> dict[str, int]:
    """Re-stage sf0.1 into N_FILES-file directories (file-stream input)."""
    shutil.rmtree(STAGE, ignore_errors=True)
    events = (
        table(spark, SF_DIR, "events")
        .select(
            "event_id",
            F.col("ts").cast("timestamp").alias("ts"),  # NTZ → TZ for watermarks
            "user_id",
            "event_type",
            "value",
        )
    )
    events.repartition(N_FILES).write.parquet(f"{STAGE}/events")
    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.filter(F.col("doc_id") % 2 == 1).repartition(N_FILES).write.parquet(
        f"{STAGE}/docs_batch"
    )
    return {
        "events": events.count(),
        "docs_batch": docs.filter(F.col("doc_id") % 2 == 1).count(),
    }


def drain(spark, name: str, out_df) -> dict:
    t0 = time.perf_counter()
    q = (
        out_df.writeStream.format("memory")
        .queryName(f"bench_{name}")
        .outputMode("append")
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", f"{STAGE}/_ckpt_{name}"
        )
        .start()
    )
    q.awaitTermination(600)
    wall = time.perf_counter() - t0
    batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    rows_out = spark.sql(f"SELECT count(*) FROM bench_{name}").collect()[0][0]
    return {"wall_s": round(wall, 3), "rows_out": rows_out, "micro_batches": batches}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "STREAMING_BENCH.json"
    spark = get_spark(app_name="streaming-bench")
    counts = stage(spark)

    def ev_stream():
        return (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double"
            )
            .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
            .parquet(f"{STAGE}/events")
        )

    def doc_stream():
        return (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
            .parquet(f"{STAGE}/docs_batch")
        )

    index_signed = with_minhash(
        table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 2 == 0),
        "doc_id",
        "text",
        k=16,
        shingle_n=1,
    )

    runs = {
        "streaming_sessions": lambda: streaming_sessions(ev_stream()),
        "streaming_hourly_counts": lambda: streaming_hourly_counts(ev_stream()),
        "streaming_episodes": lambda: streaming_episodes(
            ev_stream().select("user_id", "ts", "value"), gap="30 minutes"
        ),
        "streaming_exact_dedup": lambda: streaming_exact_dedup(doc_stream()),
        "streaming_lsh_admission": lambda: streaming_lsh_admission(
            doc_stream(), index_signed
        ),
    }
    results = {}
    for name, build in runs.items():
        rows_in = counts["events"] if name.startswith("streaming_s") or "hourly" in name or "episodes" in name else counts["docs_batch"]
        r = drain(spark, name, build())
        r["rows_in"] = rows_in
        r["rows_per_sec"] = round(rows_in / r["wall_s"]) if r["wall_s"] else None
        results[name] = r
        print(f"# {name}: {r}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(
            {
                "sf_dir": SF_DIR,
                "n_files": N_FILES,
                "files_per_trigger": FILES_PER_TRIGGER,
                "queries": results,
            },
            f,
            indent=1,
        )
        f.write("\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
