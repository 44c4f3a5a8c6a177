"""Round-7 plan pins: the skew-safe sessionization decomposition.

The events100 suite measured the native session window at 5.14× under
a 135× Zipf head — the one row AT the bar (SCALING.md round 7).
``session_window_agg_bucketed`` is the CUSUM-style (user, day) bucket
decomposition; these tests pin (a) value identity with the native
operator and (b) the plan property that makes it skew-safe: every
fact-scale ordered window carries the day bucket key.
"""

from __future__ import annotations

import re

from sleep_edf_data_pipeline_spark.queries.event_windows import (
    q_session_window_agg,
    q_session_window_agg_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_equals_native_row_for_row(spark):
    """The decomposition may change the plan, never the values: both
    share one DuckDB oracle, and here they must agree row for row."""
    native = sorted(
        map(tuple, q_session_window_agg(spark, SF_DIR).collect())
    )
    bucketed = sorted(
        map(tuple, q_session_window_agg_bucketed(spark, SF_DIR).collect())
    )
    assert native == bucketed


def test_bucketed_fact_windows_carry_day_key(spark):
    """Fact-scale ordered walks (ts ASC) must partition by (user, day);
    only the session-row chain pass may partition by user alone."""
    plan = (
        q_session_window_agg_bucketed(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    fact_specs = [s for s in specs if re.search(r"ts#\d+", s)]
    assert fact_specs, specs
    for s in fact_specs:
        assert "day#" in s, (s, plan)
    # no unpartitioned ordered window anywhere
    for s in specs:
        assert not re.match(r"\s*\w+#\d+L? ASC", s), (s, plan)


def test_occupancy_fact_windows_carry_hour_key(spark):
    """The sweep-line global prefix must never put the delta stream in
    one sorted task: fact-scale ordered walks (t ASC) carry (day,
    hour); the only unpartitioned ordered spec is the day-offsets
    frame (calendar-bounded, data-volume-independent)."""
    import re

    from sleep_edf_data_pipeline_spark.queries.occupancy import (
        q_peak_concurrent_sessions,
    )

    plan = (
        q_peak_concurrent_sessions(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    fact_specs = [s for s in specs if re.search(r"\bt#\d+ ASC", s)]
    assert fact_specs, specs
    for s in fact_specs:
        assert "hour#" in s, (s, plan)
    for s in specs:
        if re.match(r"\s*day#\d+ ASC", s):
            continue  # the calendar-bounded day-offsets frame
        assert not re.match(r"\s*\w+#\d+L? ASC", s), (s, plan)


def test_occupancy_conservation(spark):
    """Peaks are positive wherever sessions exist and every +1 is
    matched by a −1: summing the netted deltas over all hours is 0."""
    from pyspark.sql import functions as F

    from sleep_edf_data_pipeline_spark.queries.event_windows import (
        q_session_window_agg,
    )
    from sleep_edf_data_pipeline_spark.queries.occupancy import (
        q_peak_concurrent_sessions,
    )

    out = q_peak_concurrent_sessions(spark, SF_DIR)
    rows = out.collect()
    assert rows and all(r["peak_concurrent"] >= 1 for r in rows)
    n_sessions = q_session_window_agg(spark, SF_DIR).count()
    # every session contributes exactly two boundary events (netting
    # can only merge coincident ones, never drop them)
    assert sum(r["n_boundary_events"] for r in rows) <= 2 * n_sessions
    # the global peak is bounded by concurrent users
    assert max(r["peak_concurrent"] for r in rows) <= n_sessions


def test_symspell_matches_brute_at_distance_one(spark):
    """Deletion-neighborhood candidates are COMPLETE for ed ≤ 1: the
    equi-join path must reproduce the brute force length-blocked join
    filtered to distance 1, pair for pair."""
    from sleep_edf_data_pipeline_spark.queries.edit_distance import (
        q_fuzzy_name_dedup_symspell,
    )
    from sleep_edf_data_pipeline_spark.queries.relational_breadth import (
        q_fuzzy_name_dedup,
    )

    brute = sorted(
        (r["name_a"], r["name_b"], r["edit_dist"])
        for r in q_fuzzy_name_dedup(spark, SF_DIR).collect()
        if r["edit_dist"] <= 1
    )
    sym = sorted(
        map(tuple, q_fuzzy_name_dedup_symspell(spark, SF_DIR).collect())
    )
    assert sym == brute


def test_symspell_plan_equi_join_no_broadcast_nlj(spark):
    """The candidate join must be a hash equi-join on the variant —
    never the brute path's BroadcastNestedLoopJoin, and no cartesian
    product anywhere."""
    from sleep_edf_data_pipeline_spark.queries.edit_distance import (
        q_fuzzy_name_dedup_symspell,
    )

    plan = (
        q_fuzzy_name_dedup_symspell(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan  # the exactness verify is in-plan
