"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect-to-count) after
one warm-up pass of the smallest query to amortize JVM/session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sleep_edf_data_pipeline_spark import registry
from sleep_edf_data_pipeline_spark.session import get_spark

#: Headline queries: the analytical spine (reference-parity marts) plus
#: the training-data operators that dominate at 100 TB (dedup,
#: similarity, multimodal).  DuckDB-oracle wall times for the same
#: queries at sf0.1 are committed in BENCH_DUCKDB_SF0.1.json for
#: comparison (the oracle is the effective baseline per BASELINE.md).
HEADLINE = [
    "staging_cast",
    "moving_average",
    "sleep_metrics",
    "sleep_summary",
    "sleep_features",
    "session_window_agg",
    "minhash_lsh_neardups",
    "simhash_neardups",
    "cosine_topk_bruteforce",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench")
    queries, _ = registry.collect()

    # Warm-up: trigger JVM codegen paths once so per-query timings
    # measure the engine, not session startup; the mapInPandas no-op
    # forks the Python worker pool once up-front (on a long-running
    # cluster the workers are resident — the fork is deploy cost, not
    # query cost).
    queries["staging_cast"](spark, sf_dir).count()
    spark.range(32, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
