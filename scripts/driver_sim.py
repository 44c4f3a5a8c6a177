"""Driver simulation: hash-compare every __spark_entry__ query vs DuckDB.

Usage: python /tmp/driver_sim.py /root/testdata/sf0.01 [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TEST_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_hash(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    payload = df.reset_index(drop=True).to_csv(index=False, float_format="%.6f")
    return hashlib.md5(payload.encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, "/root/repo")
    import importlib
    entry_mod = importlib.import_module("__spark_entry__")

    con = duckdb.connect()
    for t in TEST_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n = entry_mod.entry(spark).count()
    print(f"entry() rows={n}", flush=True)
    assert n >= 0

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
            if name in oracles:
                oracle_pdf = con.execute(oracles[name]).df()
                hs, ho = norm_hash(spark_pdf), norm_hash(oracle_pdf)
                ok = hs == ho and len(spark_pdf) == len(oracle_pdf)
                status = "OK " if ok else "HASH-MISMATCH"
                if not ok:
                    failures.append(name)
            else:
                status = "OK(rows-only)"
            print(
                f"{status} {name} rows={len(spark_pdf)} {time.time()-t0:.1f}s",
                flush=True,
            )
        except Exception as e:
            failures.append(name)
            print(f"ERR {name}: {str(e)[:200]}", flush=True)
        spark.catalog.clearCache()

    print(f"\n{'FAILURES: ' + ', '.join(failures) if failures else 'ALL GREEN'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
