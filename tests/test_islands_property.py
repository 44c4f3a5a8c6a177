"""Property-based check of gaps-and-islands episode detection.

The reference's regression net is a hand-seeded nap corpus
(`/root/reference/scripts/seed_dev_data.py:5-10`); SURVEY §5 notes it
has no property-based testing.  Here hypothesis drives the Spark
operators with arbitrary stage sequences and compares every
intermediate (run key behavior, breaks, episode ids, main-episode
bounds, period flag) against an independent pure-Python model of the
dbt SQL semantics (`models/intermediate/sleep_metrics.sql:84-177`).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.operators.islands import (
    with_episode_breaks,
    with_episode_ids,
    with_main_episode_bounds,
    with_run_keys,
)

ENTITY, ORDER = ["subject_id"], ["epoch_idx"]


def python_model(is_sleep: list[int], gap: int) -> dict:
    """Independent restatement of R7-R14 for one subject."""
    n = len(is_sleep)
    # R7: run key = rn_all - rn_by_state (1-indexed row numbers).
    seen_state: dict[int, int] = {0: 0, 1: 0}
    run_key = []
    for i, s in enumerate(is_sleep):
        seen_state[s] += 1
        run_key.append((i + 1) - seen_state[s])
    # R8: break = wake run of length >= gap.
    run_len: dict[tuple[int, int], int] = {}
    for s, r in zip(is_sleep, run_key):
        run_len[(s, r)] = run_len.get((s, r), 0) + 1
    breaks = [
        1 if (s == 0 and run_len[(s, r)] >= gap) else 0
        for s, r in zip(is_sleep, run_key)
    ]
    # R9: episode id = running sum of breaks.
    episode, acc = [], 0
    for b in breaks:
        acc += b
        episode.append(acc)
    # R10: main episode = most sleep, tie -> lowest id; only episodes
    # with any sleep qualify.
    totals: dict[int, int] = {}
    for e, s in zip(episode, is_sleep):
        totals[e] = totals.get(e, 0) + s
    candidates = [(tot, e) for e, tot in totals.items() if tot > 0]
    if candidates:
        best = min(candidates, key=lambda te: (-te[0], te[1]))[1]
        sleep_idx = [i for i in range(n) if episode[i] == best and is_sleep[i] == 1]
        onset, final = min(sleep_idx), max(sleep_idx)
        flag = [onset <= i <= final for i in range(n)]
    else:
        onset = final = None
        flag = [False] * n
    return {
        "run_key": run_key,
        "breaks": breaks,
        "episode": episode,
        "onset": onset,
        "final": final,
        "flag": flag,
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    seqs=st.lists(
        st.lists(st.integers(min_value=0, max_value=1), min_size=1, max_size=30),
        min_size=1,
        max_size=3,
    ),
    gap=st.integers(min_value=1, max_value=4),
)
def test_islands_match_python_model(spark, seqs, gap):
    rows = [
        (sid, i, s)
        for sid, seq in enumerate(seqs)
        for i, s in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "subject_id int, epoch_idx int, is_sleep int")
    out = with_run_keys(df, "is_sleep", ENTITY, ORDER)
    out = with_episode_breaks(out, gap, ENTITY)
    out = with_episode_ids(out, ENTITY, ORDER)
    out = with_main_episode_bounds(out, ENTITY, "epoch_idx")
    got = {
        (r["subject_id"], r["epoch_idx"]): r
        for r in out.collect()
    }
    for sid, seq in enumerate(seqs):
        model = python_model(seq, gap)
        for i in range(len(seq)):
            r = got[(sid, i)]
            assert r["run_key"] == model["run_key"][i], (sid, i, "run_key")
            assert r["is_episode_break"] == model["breaks"][i], (sid, i, "break")
            assert r["episode_id"] == model["episode"][i], (sid, i, "episode")
            assert r["onset_idx"] == model["onset"], (sid, i, "onset")
            assert r["final_idx"] == model["final"], (sid, i, "final")
            assert r["is_in_period"] == model["flag"][i], (sid, i, "flag")


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    seq=st.lists(st.integers(min_value=0, max_value=1), min_size=1, max_size=40),
    gap=st.integers(min_value=1, max_value=5),
)
def test_islands_invariants(spark, seq, gap):
    """Structural invariants independent of the model."""
    df = spark.createDataFrame(
        [(0, i, s) for i, s in enumerate(seq)],
        "subject_id int, epoch_idx int, is_sleep int",
    )
    out = with_episode_ids(
        with_episode_breaks(with_run_keys(df, "is_sleep", ENTITY, ORDER), gap, ENTITY),
        ENTITY,
        ORDER,
    )
    rows = sorted(out.collect(), key=lambda r: r["epoch_idx"])
    # Episode id is the running sum of break flags: it starts at the
    # first row's flag and steps by exactly each row's flag.
    assert rows[0]["episode_id"] == rows[0]["is_episode_break"]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["episode_id"] - prev["episode_id"] == cur["is_episode_break"]
    # A sleep epoch is never an episode break.
    assert all(not (r["is_sleep"] == 1 and r["is_episode_break"] == 1) for r in rows)
