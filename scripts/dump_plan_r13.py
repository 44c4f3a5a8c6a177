"""Dump full ``explain("formatted")`` output for named queries.

Round-13 optimization deliverable: ``plans/r13/<query>_<tag>.txt`` per
touched query, captured before and after each change so the judge can
diff plan shapes (Exchange count, join strategy, PushedFilters,
codegen spans) against the claims in OPTIMIZATION_r13.md.

Usage: python scripts/dump_plan_r13.py <tag> <name> [<name> ...]
       (tag is e.g. "before" / "after"; sf dir from $SPARK_GRAFT_SF_DIR,
        default sf0.1 — plans are shape-stable across SFs, but the bench
        SF is the one whose AQE thresholds matter)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sleep_edf_data_pipeline_spark import registry
from sleep_edf_data_pipeline_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r13",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plan-r13")
    queries, _ = registry.collect()
    for name in names:
        df = queries[name](spark, sf_dir)
        tree = (
            df._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(tree)
        print(f"wrote {path} ({len(tree.splitlines())} lines)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
