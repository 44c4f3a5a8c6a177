"""Run the full corpus build at sf0.1 and record wall + audit.

The end-to-end number a corpus team actually quotes: raw documents in,
training shards out, one DAG.  Writes CORPUS_BUILD.json.

Usage: python scripts/corpus_build.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sleep_edf_data_pipeline_spark.plans.corpus_pipeline import build_corpus
from sleep_edf_data_pipeline_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--select"]
    select = "--select" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_path = args[1] if len(args) > 1 else (
        "CORPUS_BUILD_SELECTED.json" if select else "CORPUS_BUILD.json"
    )
    work = "/tmp/corpus_build_out"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(app_name="corpus-build")
    t0 = time.perf_counter()
    audit, _ = build_corpus(spark, sf_dir, work, select=select)
    wall = round(time.perf_counter() - t0, 3)
    rows = {r["stage"]: r["rows"] for r in audit.collect()}
    n_shards = len(
        [f for f in os.listdir(f"{work}/shards") if f.endswith(".json")]
    )
    result = {
        "sf_dir": sf_dir,
        "wall_s": wall,
        "stages": rows,
        "n_shard_files": n_shards,
        "docs_per_sec": round(rows["corpus_raw"] / wall) if wall else None,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
