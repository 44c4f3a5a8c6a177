"""Skew-mitigation helpers: salted aggregation and salted joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most runtime skew; these helpers cover the two
cases AQE cannot re-plan:

- **Hot-key aggregation** (`salted_agg`): a groupBy where one key holds
  a large share of all rows bottlenecks a single reducer.  Splitting
  each key into ``n_salts`` sub-keys and aggregating twice keeps every
  reducer bounded at ``rows/key/n_salts``.  Only algebraic aggregates
  (re-aggregatable partials: sum/count/min/max) are accepted — an avg
  must be decomposed by the caller into sum+count.
- **Hot-key join** (`replicated_join`): a shuffle join whose probe side
  has hot keys but whose build side is too big to broadcast whole.
  The build side is replicated ``n_salts`` times (explode) while each
  probe row picks one deterministic salt, so a hot key's probe rows
  spread over ``n_salts`` reducers and still each find their build row.
  Build-side growth is the price: use for builds that are small-ish
  (dimension-scale) but above the broadcast threshold.

Both transforms are *semantics-preserving* — results equal the unsalted
plan exactly (tests/test_dedup_ops.py drives the equivalence).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Aggregates whose partials re-aggregate with the same function.
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_FIRST = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-stage skew-safe groupBy: (keys, salt) partials → keys merge.

    ``aggs`` maps output column → (func, input column) with func in
    {sum, count, min, max}.  ``salt_on`` picks the column whose hash
    spreads rows across salts (defaults to a per-partition-random spread
    via ``spark_partition_id``-independent hash of all non-key columns'
    first; deterministic given the data).
    """
    bad = [f for f, _ in aggs.values() if f not in _FIRST]
    if bad:
        raise ValueError(f"non-algebraic aggregates cannot be salted: {bad}")
    salt_src = (
        F.col(salt_on)
        if salt_on
        else F.coalesce(
            *[F.hash(F.col(c)) for c in df.columns if c not in keys],
            F.lit(0),
        )
    )
    salted = df.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _FIRST[func](F.col(src)).alias(f"_p_{out}")
            for out, (func, src) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _MERGE[func](F.col(f"_p_{out}")).alias(out)
            for out, (func, src) in aggs.items()
        ]
    )


def replicated_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: replicate build ×n_salts, salt probe rows.

    Each probe row joins exactly one of the ``n_salts`` build replicas,
    chosen by a deterministic hash of the whole probe row, so hot join
    keys fan across ``n_salts`` reducers.  Result equals
    ``probe.join(build, on, how)`` for how in {inner, left}.
    """
    if how not in ("inner", "left"):
        raise ValueError("replicated_join supports inner/left only")
    salt_src = F.coalesce(
        *[F.hash(F.col(c)) for c in probe.columns if c not in on], F.lit(0)
    )
    p = probe.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return p.join(b, [*on, "_salt"], how).drop("_salt")
