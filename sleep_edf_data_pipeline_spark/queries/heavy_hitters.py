"""Heavy hitters: exact top-k keys and a count-min-sketch twin.

The hot-key question (`which user_ids dominate the events stream?`)
complements `key_skew_report` (which quantifies concentration without
naming keys).  Two registered forms:

- ``heavy_hitters_exact`` — oracle-checked: one hash aggregation over
  the key space, TakeOrdered for the top-20.  Correct at any scale,
  but the groupBy exchanges EVERY distinct key; at 100 TB with
  billions of user_ids that full-key shuffle is the dominant cost.
- ``heavy_hitters_cms`` — the bounded-state path (rows-only by
  design, anchored by the exact twin + error-bound tests, same
  contract as the other sketches): ONE pass builds a Spark
  ``count_min_sketch`` aggregate — a fixed ~5 MB mergeable summary,
  combined map-side, so nothing key-shaped ever shuffles — plus a
  per-partition local top-64 candidate pass (bounded:
  partitions × 64 rows).  Candidates are probed against the sketch
  driver-side (a small-by-construction collect, like the k-means
  centroid pattern) and the top-20 by estimated count returned.
  CMS never under-estimates; over-estimation is bounded by
  ``e/width · N`` with probability 1 − δ, tested in
  tests/test_sketch_tolerance.py.  NOTE the synthetic events table is
  nearly UNIFORM over user_id (≈1500 keys within a 60–99 count band
  at sf0.1, dense ties at the top-20 boundary), so the sketch's
  returned SET legitimately differs from the exact twin's at the
  boundary — the tests assert the error contract and that every
  returned key is a near-top key, not rank equality, which no sketch
  can promise on tie-dense data.

Reference parity: the reference has no sketch layer at all (its
warehouse delegates to exact SQL); this pair exists for the 100 TB
regime the reference never reaches.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table

TOPK = 20
#: CMS geometry: eps=1e-4 -> width=ceil(e/eps)=27,183 counters;
#: confidence 0.99 -> depth 5. ~1.1 MB of longs — fixed, data-free.
CMS_EPS = 1e-4
CMS_CONFIDENCE = 0.99
CMS_SEED = 42
#: Local candidates kept per partition. A key with global share
#: > 1/CANDIDATES_PER_PARTITION of any partition it appears in is
#: guaranteed into that partition's list; in practice (Zipfian keys,
#: hash-random partition placement) the union covers every global
#: top-20 key by a wide margin — asserted against the exact twin.
CANDIDATES_PER_PARTITION = 64


def q_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user_ids by event count (total order, tie-broken)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(TOPK)
    )


ORACLE_HEAVY_HITTERS_EXACT = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT 20
"""


def _local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    counts: dict[int, int] = {}
    for pdf in batches:
        for key, n in pdf["user_id"].value_counts().items():
            k = int(key)
            counts[k] = counts.get(k, 0) + int(n)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    yield pd.DataFrame(
        {"user_id": [k for k, _ in top[:CANDIDATES_PER_PARTITION]]},
        dtype="int64",
    )


def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch top-20 (no oracle: estimates are sketch-
    specific; deterministic under the fixed seed)."""
    ev = table(spark, sf_dir, "events").select("user_id")
    sketch_bytes = ev.agg(
        F.count_min_sketch(
            "user_id",
            F.lit(CMS_EPS),
            F.lit(CMS_CONFIDENCE),
            F.lit(CMS_SEED),
        ).alias("sk")
    ).collect()[0]["sk"]
    jsketch = (
        spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(sketch_bytes)
        )
    )
    candidates = ev.mapInPandas(_local_topk, schema="user_id bigint")
    cand_ids = sorted(
        {int(r["user_id"]) for r in candidates.collect()}
    )  # bounded: partitions x 64
    ranked = sorted(
        ((int(jsketch.estimateCount(u)), u) for u in cand_ids),
        key=lambda t: (-t[0], t[1]),
    )[:TOPK]
    return spark.createDataFrame(
        [(u, est) for est, u in ranked],
        schema="user_id bigint, est_events bigint",
    )


QUERIES = {
    "heavy_hitters_exact": q_heavy_hitters_exact,
    "heavy_hitters_cms": q_heavy_hitters_cms,
}
ORACLES = {
    "heavy_hitters_exact": ORACLE_HEAVY_HITTERS_EXACT,
}
