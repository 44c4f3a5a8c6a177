"""Versioned-table commit protocol: snapshot isolation + writer CAS.

Mirrors the reference's transactional DELETE+INSERT contract
(`/root/reference/warehouse/duckdb_client.py:100-111`, pinned there by
`tests/test_warehouse.py:107-151`): readers never see a half-replaced
partition, writers serialize, interrupted writes leave no trace.
"""

from __future__ import annotations

import os
import threading

import pytest

from sleep_edf_data_pipeline_spark.writers.versioned import (
    CommitConflictError,
    commit_versioned,
    current_version,
    overwrite_where,
    read_versioned,
    vacuum,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "subject_id int, value double")


def test_commit_read_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = commit_versioned(_df(spark, [(1, 1.0), (2, 2.0)]), path, None)
    assert v1 == 1
    v2 = overwrite_where(spark, path, _df(spark, [(2, 20.0)]), "subject_id = 2")
    assert v2 == 2
    now = {(r.subject_id, r.value) for r in read_versioned(spark, path).collect()}
    assert now == {(1, 1.0), (2, 20.0)}
    # pinned read of v1 is untouched (snapshot isolation / time travel)
    old = {(r.subject_id, r.value) for r in read_versioned(spark, path, 1).collect()}
    assert old == {(1, 1.0), (2, 2.0)}


def test_stale_writer_conflicts_and_nothing_publishes(spark, tmp_path):
    path = str(tmp_path / "t")
    commit_versioned(_df(spark, [(1, 1.0)]), path, None)
    commit_versioned(_df(spark, [(1, 2.0)]), path, 1)  # moves table to v2
    with pytest.raises(CommitConflictError):
        commit_versioned(_df(spark, [(1, 99.0)]), path, 1)  # stale base
    assert current_version(path) == 2
    rows = {r.value for r in read_versioned(spark, path).collect()}
    assert rows == {2.0}  # loser's data is invisible AND cleaned up
    assert not [n for n in os.listdir(path) if n.startswith("_stage_")]


def test_unmarked_directory_is_invisible_and_vacuumed(spark, tmp_path):
    path = str(tmp_path / "t")
    commit_versioned(_df(spark, [(1, 1.0)]), path, None)
    # simulate a writer that crashed after staging data, before the
    # marker link: the directory exists but no commit references it
    _df(spark, [(9, 9.0)]).write.parquet(os.path.join(path, "d_crashed"))
    rows = {r.subject_id for r in read_versioned(spark, path).collect()}
    assert rows == {1}
    vacuum(path, keep_last=1)
    assert not os.path.exists(os.path.join(path, "d_crashed"))
    assert current_version(path) == 1


def test_concurrent_writers_serialize_via_retry(spark, tmp_path):
    """4 threads upsert disjoint subjects concurrently; every write
    lands exactly once and the version count equals the commit count."""
    path = str(tmp_path / "t")
    commit_versioned(_df(spark, [(0, 0.0)]), path, None)
    errors = []

    def upsert(sid):
        try:
            overwrite_where(
                spark,
                path,
                _df(spark, [(sid, float(sid) * 10)]),
                f"subject_id = {sid}",
                max_retries=20,
            )
        except Exception as e:  # noqa: BLE001 - collected for assert
            errors.append(e)

    threads = [threading.Thread(target=upsert, args=(s,)) for s in (1, 2, 3, 4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert current_version(path) == 5  # 1 seed + 4 serialized commits
    rows = {(r.subject_id, r.value) for r in read_versioned(spark, path).collect()}
    assert rows == {(0, 0.0), (1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)}


def test_vacuum_keeps_recent_versions_readable(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(4):
        overwrite_where(spark, path, _df(spark, [(1, float(i))]), "subject_id = 1")
    removed = vacuum(path, keep_last=2)
    assert removed == [1, 2]
    assert {r.value for r in read_versioned(spark, path, 3).collect()} == {2.0}
    assert {r.value for r in read_versioned(spark, path).collect()} == {3.0}
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, path, 1)


def test_merge_upsert_update_insert_delete(spark, tmp_path):
    from sleep_edf_data_pipeline_spark.writers.versioned import merge_upsert

    path = str(tmp_path / "t")
    commit_versioned(_df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]), path, None)
    v = merge_upsert(
        spark,
        path,
        _df(spark, [(2, 20.0), (4, 40.0)]),
        keys=["subject_id"],
        delete_condition="subject_id = 3",
    )
    assert v == 2
    rows = {(r.subject_id, r.value) for r in read_versioned(spark, path).collect()}
    # 1 untouched, 2 updated, 3 deleted, 4 inserted
    assert rows == {(1, 1.0), (2, 20.0), (4, 40.0)}


def test_merge_upsert_into_empty_table(spark, tmp_path):
    from sleep_edf_data_pipeline_spark.writers.versioned import merge_upsert

    path = str(tmp_path / "t")
    assert merge_upsert(spark, path, _df(spark, [(1, 1.0)]), ["subject_id"]) == 1
    assert {r.subject_id for r in read_versioned(spark, path).collect()} == {1}


def test_compact_preserves_rows_in_fewer_files(spark, tmp_path):
    from sleep_edf_data_pipeline_spark.writers.versioned import (
        compact,
        snapshot_dir,
    )

    path = str(tmp_path / "t")
    commit_versioned(_df(spark, [(i, float(i)) for i in range(20)]).repartition(8), path, None)
    n_before = len(
        [f for f in os.listdir(snapshot_dir(path, 1)) if f.endswith(".parquet")]
    )
    assert n_before == 8
    v = compact(spark, path, target_files=1)
    assert v == 2
    n_after = len(
        [f for f in os.listdir(snapshot_dir(path, 2)) if f.endswith(".parquet")]
    )
    assert n_after == 1
    rows = {(r.subject_id, r.value) for r in read_versioned(spark, path).collect()}
    assert rows == {(i, float(i)) for i in range(20)}


def test_history_lists_commits_newest_first(spark, tmp_path):
    from sleep_edf_data_pipeline_spark.writers.versioned import (
        commit_versioned,
        history,
        vacuum,
    )

    path = str(tmp_path / "hist")
    assert history(path) == []
    v1 = commit_versioned(spark.range(10), path, None)
    v2 = commit_versioned(spark.range(20), path, v1)
    v3 = commit_versioned(spark.range(5), path, v2)
    h = history(path)
    assert [e["version"] for e in h] == [v3, v2, v1]
    assert all(e["n_files"] > 0 and e["bytes"] > 0 for e in h)
    assert h[0]["committed_at"] >= h[-1]["committed_at"]
    # vacuumed versions drop out of the history
    vacuum(path, keep_last=1)
    assert [e["version"] for e in history(path)] == [v3]
