"""Regenerate BENCH_DUCKDB_SF0.1.json: oracle wall times for bench.py's
headline queries, executed by DuckDB on the same parquet.

The reference publishes no sec/query numbers (BASELINE.md), so the
DuckDB oracle running identical SQL on identical data is the effective
single-node baseline the Spark engine is compared against.

Usage: python scripts/bench_duckdb.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import HEADLINE
from sleep_edf_data_pipeline_spark import registry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    # --only a,b,c: time just those queries and MERGE into an existing
    # output file (re-timing the 600 s ngram oracle to add one new
    # query would be waste); totals are recomputed over the merge.
    only: set[str] | None = None
    argv = list(sys.argv[1:])
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"
    out_path = argv[1] if len(argv) > 1 else "BENCH_DUCKDB_SF0.1.json"
    tag = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1"
    try:
        sf = float(tag)
    except ValueError:  # synthetic decade corpora: /tmp/scale10 etc.
        sf = tag
    _, oracles = registry.collect()
    con = duckdb.connect()
    con.execute(f"SET threads = {os.cpu_count()}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    cap = float(os.environ.get("DUCKDB_BENCH_CAP_S", "600"))
    timings: dict[str, float] = {}
    timeouts: list[str] = []
    total = 0.0
    for name in HEADLINE:
        if only is not None and name not in only:
            continue
        if name not in oracles:
            print(f"# {name}: no oracle, skipped", file=sys.stderr)
            continue
        watchdog = threading.Timer(cap, con.interrupt)
        watchdog.start()
        t0 = time.perf_counter()
        try:
            # Full materialization (not just a count) so DuckDB does the
            # same output work Spark's count-after-compute does.
            con.execute(f"CREATE OR REPLACE TEMP TABLE _r AS ({oracles[name]})")
            n = con.execute("SELECT count(*) FROM _r").fetchone()[0]
            dt = time.perf_counter() - t0
            print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
        except duckdb.InterruptException:
            dt = cap
            timeouts.append(name)
            print(f"# {name}: TIMEOUT at {cap:.0f}s (recorded as {cap:.0f})", file=sys.stderr)
        finally:
            watchdog.cancel()
        timings[name] = round(dt, 3)
        total += dt
    if only is not None and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
        merged = dict(prior.get("queries", {}))
        merged.update(timings)
        # drop entries for queries no longer in HEADLINE (renamed or
        # removed) — stale rows would inflate the reported total forever
        live = set(HEADLINE)
        timings = {k: v for k, v in merged.items() if k in live}
        timeouts = sorted(
            (set(prior.get("timed_out", [])) | set(timeouts)) & live
        )
        total = sum(timings.values())
    payload = {
        "metric": "duckdb_oracle_headline_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "threads": os.cpu_count(),
        "method": "CREATE TEMP TABLE AS (full materialization)",
        "timeout_cap_s": cap,
        "timed_out": timeouts,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
