"""Heavy hitters: exact top-k keys and a count-min-sketch twin.

The hot-key question (`which user_ids dominate the events stream?`)
complements `key_skew_report` (which quantifies concentration without
naming keys).  Two registered forms:

- ``heavy_hitters_exact`` — oracle-checked: one hash aggregation over
  the key space, TakeOrdered for the top-20.  Correct at any scale,
  but the groupBy exchanges EVERY distinct key; at 100 TB with
  billions of user_ids that full-key shuffle is the dominant cost.
- ``heavy_hitters_cms`` — the bounded-state path.  Registered as its
  VERDICT form since round 11 (``q_heavy_hitters_cms_verdict``): the
  driver row is rows-only by design (a sketch cannot hash-match an
  exact oracle), so the registered rows now carry the tolerance
  contract itself — est vs exact per key, the 3·eps·N bound, and the
  within_bound/near_top flags.  The sketch core: ONE pass builds a Spark
  ``count_min_sketch`` aggregate — a fixed ~1.1 MB mergeable summary
  (eps=1e-4 -> width=ceil(2/eps)=20,000 counters; confidence 0.99 ->
  depth=ceil(-ln(0.01)/ln 2)=7), combined map-side, so nothing
  key-shaped ever shuffles — plus a per-partition Space-Saving
  candidate pass whose executor state is a FIXED number of counters
  (``SPACE_SAVING_COUNTERS``), independent of the partition's
  distinct-key count.  The serialized sketch bytes ride into a
  mapInPandas closure and are probed executor-side by the pure-Python
  reader in ``functions/cms.py`` — no ``spark._jvm`` access anywhere,
  so the query runs under Spark Connect as well as classic PySpark.
  The only driver-side collect is the single sketch row.
  CMS never under-estimates; over-estimation is bounded by
  ``eps · N`` with probability 1 − δ per probe, tested in
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

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cms import CountMinSketchReader
from ..tables import table

TOPK = 20
CMS_EPS = 1e-4
CMS_CONFIDENCE = 0.99
CMS_SEED = 42
#: Space-Saving summary size per partition.  The classic guarantee:
#: with m counters, any key whose in-partition count exceeds n_p/m is
#: guaranteed to be IN the summary when the partition ends, and every
#: counter over-estimates its key's true in-partition count by at most
#: n_p/m.  4096 counters ≈ 64 KiB of dict state — fixed, regardless of
#: how many billions of distinct keys stream through the partition.
SPACE_SAVING_COUNTERS = 4096
#: Local candidates emitted per partition (top of the Space-Saving
#: summary).  The downstream union is bounded by partitions × 64 rows;
#: in practice (skewed keys, hash-random partition placement) it
#: covers every global top-20 key by a wide margin — asserted against
#: the exact twin in tests.
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


def _space_saving_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Bounded per-partition candidates via BATCHED weighted Space-Saving.

    Executor state stays ≤ SPACE_SAVING_COUNTERS + one Arrow batch's
    distinct keys: each batch's value_counts merge into the summary,
    then ONE truncation pass keeps the top counters and records the
    largest evicted count as ``floor``; later arrivals of unseen keys
    start from ``floor`` (the Space-Saving substitution, applied per
    batch instead of per key).  Counters therefore only over-estimate,
    and any key heavy within the partition survives to partition end.

    Why batched: the textbook per-arrival eviction scans the summary
    for its minimum — O(m) per eviction, which on a mostly-unique
    stream is O(n·m) and measured ~50 s per 13.5M-row partition set at
    the 100× decade.  One sort per batch is O((m + b)·log(m + b)) and
    took the same corpus to ~2 s (SCALE_SMOKE_EVENTS100.json).
    """
    counters: dict[int, int] = {}
    floor = 0
    for pdf in batches:
        for key, n in pdf["user_id"].value_counts().items():
            k = int(key)
            counters[k] = counters.get(k, floor) + int(n)
        if len(counters) > SPACE_SAVING_COUNTERS:
            ranked = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
            counters = dict(ranked[:SPACE_SAVING_COUNTERS])
            floor = max(floor, ranked[SPACE_SAVING_COUNTERS][1])
    top = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
    yield pd.DataFrame(
        {"user_id": [k for k, _ in top[:CANDIDATES_PER_PARTITION]]},
        dtype="int64",
    )


def _make_probe(
    sketch_bytes: bytes,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Executor-side sketch probe; the ~1.1 MB serialized sketch rides
    in the task closure (fixed size by construction — eps and
    confidence, not data, set it), parsed once per task."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        reader = CountMinSketchReader(sketch_bytes)
        for pdf in batches:
            ids = pdf["user_id"].astype("int64")
            yield pd.DataFrame(
                {
                    "user_id": ids,
                    "est_events": [reader.estimate_long(int(u)) for u in ids],
                }
            )

    return probe


def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch top-20 (no oracle: estimates are sketch-
    specific; deterministic under the fixed seed).  This is the
    PRODUCTION sketch path — one sketch fold + one bounded candidate
    pass, no exact aggregation anywhere."""
    ev = table(spark, sf_dir, "events").select("user_id")
    sketch_bytes = bytes(
        ev.agg(
            F.count_min_sketch(
                "user_id",
                F.lit(CMS_EPS),
                F.lit(CMS_CONFIDENCE),
                F.lit(CMS_SEED),
            ).alias("sk")
        ).collect()[0]["sk"]
    )
    candidates = (
        ev.mapInPandas(_space_saving_topk, schema="user_id bigint")
        .distinct()
    )
    estimated = candidates.mapInPandas(
        _make_probe(sketch_bytes), schema="user_id bigint, est_events bigint"
    )
    return estimated.orderBy(
        F.desc("est_events"), F.asc("user_id")
    ).limit(TOPK)


def q_heavy_hitters_cms_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REGISTERED form (VERDICT r10 item 7): the sketch top-20 with
    its tolerance verdict per key — est vs exact count, the 3·eps·N
    bound, and the within_bound / near_top pass flags — so the driver's
    rows-only record carries a checkable contract instead of bare
    estimates no oracle can match.

    Deliberately runs the exact twin too (one extra hash agg over
    events + a top-2k floor): this entry is the VERIFICATION query; a
    production caller wanting only estimates uses
    ``q_heavy_hitters_cms`` above, which never touches the exact agg.
    All three extra frames (20-row estimates, 1-row total, 1-row
    floor) are broadcast; the only corpus-scale stages are the sketch
    fold, the candidate pass, and the exact groupBy.
    """
    est = q_heavy_hitters_cms(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    exact = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("true_events")
    )
    n_total = ev.agg(F.count("*").cast("bigint").alias("n_total"))
    # near-top floor: the 2k-th exact count (tie-dense uniform data
    # makes rank equality at the top-20 boundary meaningless; the
    # contract is "every returned key is a near-top key").
    near_floor = (
        exact.orderBy(F.desc("true_events"), F.asc("user_id"))
        .limit(2 * TOPK)
        .agg(F.min("true_events").cast("bigint").alias("near_top_floor"))
    )
    joined = (
        exact.join(F.broadcast(est), "user_id")
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(near_floor))
    )
    overcount = (F.col("est_events") - F.col("true_events")).cast("bigint")
    bound = F.lit(3.0 * CMS_EPS) * F.col("n_total").cast("double")
    return joined.select(
        "user_id",
        "est_events",
        "true_events",
        overcount.alias("overcount"),
        F.round(bound, 1).alias("bound_3_eps_n"),
        ((overcount >= 0) & (overcount.cast("double") <= bound)).alias(
            "within_bound"
        ),
        (F.col("true_events") >= F.col("near_top_floor")).alias("near_top"),
    ).orderBy(F.desc("est_events"), F.asc("user_id"))


QUERIES = {
    "heavy_hitters_exact": q_heavy_hitters_exact,
    "heavy_hitters_cms": q_heavy_hitters_cms_verdict,
}
ORACLES = {
    "heavy_hitters_exact": ORACLE_HEAVY_HITTERS_EXACT,
}
