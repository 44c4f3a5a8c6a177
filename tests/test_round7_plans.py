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
