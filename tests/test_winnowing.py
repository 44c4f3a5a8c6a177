"""Winnowing fingerprints: the SIGMOD-2003 guarantee, density bounds,
and the near-dup pair contract (queries/winnowing.py)."""

import pyspark.sql.functions as F
import pytest

from sleep_edf_data_pipeline_spark.queries.winnowing import (
    MAXDF,
    WINNOW_K,
    WINNOW_W,
    q_winnowing_fingerprints,
    q_winnowing_neardups,
)

GUARANTEE = WINNOW_W + WINNOW_K - 1  # 8 shared words


def _write_docs(spark, tmp_path, rows):
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id string, text string, source string, lang string"
    ).coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def _fps(spark, sf_dir):
    from sleep_edf_data_pipeline_spark.queries.winnowing import _selected

    return (
        _selected(spark, sf_dir)
        .select("doc_id", F.expr("minkey div 1048576").alias("fp_hash"))
        .distinct()
    )


def test_shared_run_guarantees_shared_fingerprint(spark, tmp_path):
    """Any two docs sharing >= W+K-1 consecutive words share at least
    one selected fingerprint — the winnowing theorem, on docs whose
    surroundings are completely disjoint."""
    shared = " ".join(f"common{i}" for i in range(GUARANTEE))
    rows = [
        ("a", f"alpha beta gamma {shared} delta epsilon", "s", "en"),
        ("b", f"one two three four five {shared} six seven", "s", "en"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    fps = _fps(spark, sf)
    a = {r.fp_hash for r in fps.filter(F.col("doc_id") == "a").collect()}
    b = {r.fp_hash for r in fps.filter(F.col("doc_id") == "b").collect()}
    assert a & b, "winnowing guarantee violated: no shared fingerprint"


def test_disjoint_docs_share_nothing(spark, tmp_path):
    rows = [
        ("a", " ".join(f"left{i}" for i in range(30)), "s", "en"),
        ("b", " ".join(f"right{i}" for i in range(30)), "s", "en"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    fps = _fps(spark, sf)
    a = {r.fp_hash for r in fps.filter(F.col("doc_id") == "a").collect()}
    b = {r.fp_hash for r in fps.filter(F.col("doc_id") == "b").collect()}
    assert not (a & b)


def test_density_bounds_and_counts(spark, sf_dir):
    rows = q_winnowing_fingerprints(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_fingerprints <= r.n_windows, r
        assert 0.0 < r.density <= 1.0, r
        assert r.n_windows == max(r.n_grams - (WINNOW_W - 1), 1)
    # selection density concentrates near the paper's 2/(W+1) = 1/3
    # for non-repetitive text; wide band, mean not per-doc
    big = [r for r in rows if r.n_grams >= 4 * WINNOW_W]
    if big:
        mean = sum(r.density for r in big) / len(big)
        assert 0.15 < mean < 0.65, mean


def test_short_doc_gets_one_window_one_fingerprint(spark, tmp_path):
    sf = _write_docs(spark, tmp_path, [("tiny", "just two", "s", "en")])
    rows = q_winnowing_fingerprints(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_grams, r.n_windows, r.n_fingerprints) == (1, 1, 1)


def test_exact_duplicate_docs_pair_up(spark, tmp_path):
    text = " ".join(f"word{i}" for i in range(40))
    noise = " ".join(f"noise{i}" for i in range(40))
    rows = [
        ("a", text, "s", "en"),
        ("b", text, "s", "en"),
        ("c", noise, "s", "en"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in q_winnowing_neardups(spark, sf).collect()
    }
    assert set(pairs) == {("a", "b")}
    assert pairs[("a", "b")] >= 2


def test_boilerplate_fingerprints_dropped(spark, tmp_path):
    """A fingerprint present in > MAXDF docs is excluded from pairing:
    MAXDF+2 docs all sharing the same text produce NO pairs (every one
    of their fingerprints is over the cap)."""
    text = " ".join(f"boiler{i}" for i in range(30))
    rows = [(f"d{i:03d}", text, "s", "en") for i in range(MAXDF + 2)]
    sf = _write_docs(spark, tmp_path, rows)
    assert q_winnowing_neardups(spark, sf).count() == 0


@pytest.mark.parametrize("name", ["winnowing_fingerprints", "winnowing_neardups"])
def test_registered_with_oracle(name):
    from sleep_edf_data_pipeline_spark import registry

    queries, oracles = registry.collect()
    assert name in queries and name in oracles


def test_guarantee_survives_position_wrap(spark, tmp_path, monkeypatch):
    """Docs longer than POSCAP grams wrap the packed key's tie-break
    cycle; the min-hash selection — and the sharing guarantee — must
    survive.  Pinned with a tiny patched POSCAP so the wrap is
    exercised without a 2^20-gram document."""
    import sleep_edf_data_pipeline_spark.queries.winnowing as W

    monkeypatch.setattr(W, "POSCAP", 16)
    shared = " ".join(f"common{i}" for i in range(GUARANTEE))
    long_prefix = " ".join(f"pad{i}" for i in range(50))  # pos >> 16
    rows = [
        ("a", f"{long_prefix} {shared}", "s", "en"),
        ("b", f"start here {shared} end bit", "s", "en"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    fps = (
        W._selected(spark, sf)
        .select("doc_id", F.expr("minkey div 16").alias("fp_hash"))
        .distinct()
    )
    a = {r.fp_hash for r in fps.filter(F.col("doc_id") == "a").collect()}
    b = {r.fp_hash for r in fps.filter(F.col("doc_id") == "b").collect()}
    assert a & b, "guarantee lost across the POSCAP wrap"


def test_source_stats_conserve_the_per_doc_profile(spark, sf_dir):
    """The per-source rollup must be exactly the per-doc query summed
    by source — one kernel, two grains."""
    import duckdb

    from sleep_edf_data_pipeline_spark.queries.winnowing import (
        q_winnowing_source_stats,
    )

    rows = {r.source: r for r in q_winnowing_source_stats(spark, sf_dir).collect()}
    per_doc = q_winnowing_fingerprints(spark, sf_dir).collect()
    src_of = dict(
        duckdb.sql(
            f"SELECT doc_id, source FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    agg = {}
    for r in per_doc:
        s = src_of[int(r.doc_id)]
        a = agg.setdefault(s, [0, 0, 0, 0])
        a[0] += 1
        a[1] += r.n_grams
        a[2] += r.n_windows
        a[3] += r.n_fingerprints
    assert set(rows) == set(agg)
    for s, (nd, ng, nw, nf) in agg.items():
        r = rows[s]
        assert (r.n_docs, r.n_grams, r.n_windows, r.n_fingerprints) == (
            nd, ng, nw, nf,
        ), s
