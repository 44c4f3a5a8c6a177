"""Map the synthetic ``events`` table onto the epoch data model.

The driver's test corpus has no sleep recordings, so the oracle-checked
queries exercise the reference's operator semantics on ``events``:

- ``user_id``          → ``subject_id`` (the entity/partition key)
- row_number by (ts, event_id) − 1 → ``epoch_idx`` (dense time index)
- ``event_type``       → ``stage`` via a 5-way decode (the P5 dict-map
  operator): error→W, click→N1, view→N2, purchase→N3, signup→REM
- ``value``            → five band powers via exact IEEE scalar
  transforms (x, 2x, x+1, x/2, x*x/1024) so both engines see identical
  bits (the /1024 keeps magnitudes small so round(…,6) of downstream
  aggregates sits far from any rounding boundary).
  No band is proportional to another: a proportional pair would make
  its downstream biomarker ratio exactly constant, whose per-subject
  stddev is pure float-cancellation noise — numerically ill-conditioned
  for any engine pair.

The episode-gap threshold scales down with the data: 3 consecutive
"wake" events end an episode (the reference uses 120 epochs = 60 min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table

#: Runs of >= 3 consecutive W events break an activity episode.
GAP_EVENTS = 3

STAGE_BY_EVENT_TYPE = {
    "error": "W",
    "click": "N1",
    "view": "N2",
    "purchase": "N3",
    "signup": "REM",
}


def epochs_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → epoch-shaped DataFrame (subject_id, epoch_idx, stage, powers)."""
    # Materialize the cast key as an ATTRIBUTE before the window, and
    # pass that same attribute through the select: the window then
    # partitions on subject_id itself, so its one
    # hashpartitioning(subject_id) exchange satisfies every downstream
    # window/aggregate in the metrics pipeline.  (Partitioning the
    # window on a fresh `cast(user_id as int)` expression and aliasing
    # another copy of the cast in the projection reads the same, but
    # Catalyst sees two unrelated expressions and inserts a second
    # exchange — measured as 2 shuffles instead of 1 for sleep_metrics.)
    ev = table(spark, sf_dir, "events").withColumn(
        "subject_id", F.col("user_id").cast("int")
    )
    w = Window.partitionBy("subject_id").orderBy("ts", "event_id")
    stage = F.when(F.col("event_type") == "error", "W")
    for et, st in list(STAGE_BY_EVENT_TYPE.items())[1:]:
        stage = stage.when(F.col("event_type") == et, st)
    v = F.col("value")
    return ev.select(
        "subject_id",
        (F.row_number().over(w).cast("int") - F.lit(1)).alias("epoch_idx"),
        stage.alias("stage"),
        v.alias("delta_power"),
        (v * 2).alias("theta_power"),
        (v + 1).alias("alpha_power"),
        (v / 2).alias("sigma_power"),
        (v * v / 1024).alias("beta_power"),
    )


#: DuckDB CTEs mirroring :func:`epochs_from_events` + plans.sleep_pipeline.
BASE_CTE = """
base AS (
    SELECT
        CAST(user_id AS INT) AS subject_id,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) - 1
            AS epoch_idx,
        CASE event_type
            WHEN 'error' THEN 'W'
            WHEN 'click' THEN 'N1'
            WHEN 'view' THEN 'N2'
            WHEN 'purchase' THEN 'N3'
            ELSE 'REM'
        END AS stage,
        value AS delta_power,
        value * 2 AS theta_power,
        value + 1 AS alpha_power,
        value / 2 AS sigma_power,
        value * value / 1024 AS beta_power
    FROM events
)
"""

STAGED_CTE = """
staged AS (
    SELECT
        md5(CAST(subject_id AS VARCHAR) || '-' || CAST(epoch_idx AS VARCHAR))
            AS epoch_id,
        CAST(subject_id AS INT) AS subject_id,
        CAST(epoch_idx AS INT) AS epoch_idx,
        CAST(stage AS VARCHAR) AS sleep_stage,
        CAST(delta_power AS DOUBLE) AS delta_power_uv,
        CAST(theta_power AS DOUBLE) AS theta_power_uv,
        CAST(alpha_power AS DOUBLE) AS alpha_power_uv,
        CAST(sigma_power AS DOUBLE) AS sigma_power_uv,
        CAST(beta_power AS DOUBLE) AS beta_power_uv
    FROM base
)
"""

#: Moving averages in fixed point (exact BIGINT window sums ÷ count):
#: bit-identical to Spark's with_moving_averages regardless of how
#: either engine accumulates its sliding frame (see
#: operators/windows.py FP_SCALE — float sliding sums drift along long
#: partitions and flip round-to-6 boundaries at sf0.1).
_FP_MAVG = (
    "CAST(sum(CAST(floor({c} * 268435456.0) AS BIGINT)) OVER w5 AS DOUBLE)"
    " / (268435456.0 * count({c}) OVER w5)"
)

WINDOWED_CTE = f"""
win AS (
    SELECT
        *,
        {_FP_MAVG.format(c="delta_power_uv")} AS delta_moving_avg,
        {_FP_MAVG.format(c="theta_power_uv")} AS theta_moving_avg,
        {_FP_MAVG.format(c="alpha_power_uv")} AS alpha_moving_avg,
        {_FP_MAVG.format(c="sigma_power_uv")} AS sigma_moving_avg,
        {_FP_MAVG.format(c="beta_power_uv")} AS beta_moving_avg,
        CASE
            WHEN lag(sleep_stage) OVER wo IS NULL THEN false
            WHEN lag(sleep_stage) OVER wo != sleep_stage THEN true
            ELSE false
        END AS is_stage_transition
    FROM staged
    WINDOW
        w5 AS (
            PARTITION BY subject_id ORDER BY epoch_idx
            ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
        ),
        wo AS (PARTITION BY subject_id ORDER BY epoch_idx)
)
"""

EPISODES_CTES = f"""
flagged AS (
    SELECT *, CASE WHEN sleep_stage = 'W' THEN 0 ELSE 1 END AS is_sleep
    FROM win
),
runs AS (
    SELECT
        *,
        CAST(
            row_number() OVER (PARTITION BY subject_id ORDER BY epoch_idx)
            - row_number() OVER (PARTITION BY subject_id, is_sleep ORDER BY epoch_idx)
            AS INT
        ) AS run_key
    FROM flagged
),
breaks AS (
    SELECT
        *,
        CASE
            WHEN is_sleep = 0
                AND count(*) OVER (PARTITION BY subject_id, is_sleep, run_key)
                    >= {GAP_EVENTS}
            THEN 1
            ELSE 0
        END AS is_episode_break
    FROM runs
),
episodes AS (
    SELECT
        *,
        CAST(
            sum(is_episode_break) OVER (
                PARTITION BY subject_id ORDER BY epoch_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS BIGINT
        ) AS episode_id
    FROM breaks
),
ranked AS (
    SELECT
        subject_id,
        episode_id,
        CAST(
            row_number() OVER (
                PARTITION BY subject_id ORDER BY sum(is_sleep) DESC, episode_id
            ) AS INT
        ) AS episode_rank
    FROM episodes
    GROUP BY subject_id, episode_id
    HAVING sum(is_sleep) > 0
),
bounds AS (
    SELECT
        e.subject_id,
        min(CASE WHEN e.is_sleep = 1 THEN e.epoch_idx END) AS sleep_onset_epoch_idx,
        max(CASE WHEN e.is_sleep = 1 THEN e.epoch_idx END) AS final_awakening_epoch_idx
    FROM episodes AS e
    JOIN ranked AS r
        ON e.subject_id = r.subject_id
        AND e.episode_id = r.episode_id
        AND r.episode_rank = 1
    GROUP BY e.subject_id
),
metrics AS (
    SELECT
        e.epoch_id,
        e.subject_id,
        e.epoch_idx,
        e.sleep_stage,
        e.delta_power_uv, e.theta_power_uv, e.alpha_power_uv,
        e.sigma_power_uv, e.beta_power_uv,
        e.delta_moving_avg, e.theta_moving_avg, e.alpha_moving_avg,
        e.sigma_moving_avg, e.beta_moving_avg,
        e.is_stage_transition,
        e.is_sleep,
        e.episode_id,
        b.sleep_onset_epoch_idx,
        b.final_awakening_epoch_idx,
        coalesce(
            e.epoch_idx BETWEEN b.sleep_onset_epoch_idx AND b.final_awakening_epoch_idx,
            false
        ) AS is_in_sleep_period
    FROM episodes AS e
    LEFT JOIN bounds AS b ON e.subject_id = b.subject_id
)
"""

#: Full prefix: WITH base, staged, win, flagged..metrics
METRICS_WITH = (
    "WITH "
    + BASE_CTE.strip().rstrip()
    + ",\n"
    + STAGED_CTE.strip()
    + ",\n"
    + WINDOWED_CTE.strip()
    + ",\n"
    + EPISODES_CTES.strip()
)
