"""Tests for queries/engine_extras.py: LPA, incremental views, NFC.

The four registered queries are hash-verified against DuckDB by the
driver contract (scripts/driver_sim.py, all three SFs); these tests pin
the semantics the oracle can't see — the hand-checkable LPA fixture,
the versioned-table incremental-refresh flow, non-ASCII NFC goldens —
plus the physical-plan shapes.
"""

from __future__ import annotations

import hashlib
import unicodedata

import pytest
from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.operators.components import (
    label_propagation,
)
from sleep_edf_data_pipeline_spark.plans.incremental import (
    finish_order_summary,
    merge_partials,
    order_summary_partial,
)
from sleep_edf_data_pipeline_spark.queries.engine_extras import (
    q_incremental_customer_summary,
    q_normalize_text_nfc,
    q_temperature_mixture_weights,
)
from sleep_edf_data_pipeline_spark.tables import table
from sleep_edf_data_pipeline_spark.writers.versioned import (
    commit_versioned,
    read_versioned,
)

SF_DIR = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# label propagation
# --------------------------------------------------------------------------


def test_lpa_two_triangles_with_bridge(spark):
    """Hand-traced 3-round mode-LPA on two bridged triangles.

    Triangles {1,2,3} and {10,11,12} joined by edge 3-10: the bridge
    must NOT merge the communities (mode propagation resists single
    weak links — the property that distinguishes LPA from connected
    components, which would collapse both into one).
    """
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)],
        "src int, dst int",
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iters=3).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3}


def test_lpa_deterministic_across_runs(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7) % 20) for i in range(20) if i != (i * 7) % 20],
        "src int, dst int",
    )
    a = sorted(map(tuple, label_propagation(edges, iters=3).collect()))
    b = sorted(map(tuple, label_propagation(edges, iters=3).collect()))
    assert a == b


# --------------------------------------------------------------------------
# incremental maintenance
# --------------------------------------------------------------------------


def _collect_summary(df):
    rows = df.collect()
    return sorted(
        (
            r["o_custkey"],
            r["n_orders"],
            r["total_spend"],
            r["max_price"],
            r["min_price"],
            r["last_order"],
            r["avg_spend"],
        )
        for r in rows
    )


def test_three_way_split_merge_equals_recompute(spark):
    """Folding arbitrary disjoint partials == one-shot aggregation."""
    orders = table(spark, SF_DIR, "orders")
    parts = [
        order_summary_partial(
            orders.filter(F.col("o_orderkey") % 3 == i)
        )
        for i in range(3)
    ]
    merged = finish_order_summary(
        merge_partials(
            parts,
            keys=["o_custkey"],
            sum_cols=["n_orders", "spend"],
            max_cols=["max_price", "last_order"],
            min_cols=["min_price"],
        )
    )
    full = finish_order_summary(
        merge_partials(
            [order_summary_partial(orders)],
            keys=["o_custkey"],
            sum_cols=["n_orders", "spend"],
            max_cols=["max_price", "last_order"],
            min_cols=["min_price"],
        )
    )
    assert _collect_summary(merged) == _collect_summary(full)


def test_versioned_incremental_refresh_flow(spark, tmp_path):
    """The production flow: stored summary + delta-only refresh.

    v1 commits the base snapshot; a delta batch commits v2.  The
    refresh reads ONLY the delta (plus the stored summary partial) —
    never re-scans v1 — and must equal a full rebuild over the v2
    snapshot.  Snapshot isolation pins both reads.
    """
    tbl = str(tmp_path / "orders_versioned")
    orders = table(spark, SF_DIR, "orders")
    cutoff = F.lit("1997-06-01").cast("timestamp")
    base = orders.filter(F.col("o_orderdate") < cutoff)
    delta = orders.filter(F.col("o_orderdate") >= cutoff)
    assert delta.count() > 0

    v1 = commit_versioned(base, tbl, None)
    stored = order_summary_partial(read_versioned(spark, tbl, v1))
    # store the partial itself (what a real MV would persist)
    mv_path = str(tmp_path / "mv_partial")
    stored.write.mode("overwrite").parquet(mv_path)

    v2 = commit_versioned(read_versioned(spark, tbl, v1).unionByName(delta), tbl, v1)

    refreshed = finish_order_summary(
        merge_partials(
            [spark.read.parquet(mv_path), order_summary_partial(delta)],
            keys=["o_custkey"],
            sum_cols=["n_orders", "spend"],
            max_cols=["max_price", "last_order"],
            min_cols=["min_price"],
        )
    )
    rebuilt = finish_order_summary(
        merge_partials(
            [order_summary_partial(read_versioned(spark, tbl, v2))],
            keys=["o_custkey"],
            sum_cols=["n_orders", "spend"],
            max_cols=["max_price", "last_order"],
            min_cols=["min_price"],
        )
    )
    assert _collect_summary(refreshed) == _collect_summary(rebuilt)


def test_streaming_incremental_summary_matches_batch(spark, tmp_path):
    """Multi-micro-batch fold == one-shot batch summary (stream twin).

    maxFilesPerTrigger=1 over a 4-file restage forces ≥4 micro-batches,
    so the equivalence genuinely exercises repeated folding, and the
    at-least-once re-delivery guard is checked explicitly.
    """
    from sleep_edf_data_pipeline_spark.streaming.incremental import (
        _MERGE_KW,
        StreamingOrderSummary,
    )

    orders = table(spark, SF_DIR, "orders")
    src = str(tmp_path / "orders_stream")
    orders.repartition(4).write.parquet(src)
    sink = StreamingOrderSummary(str(tmp_path / "mv"))
    q = (
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sink.version is not None and sink.version >= 2  # multi-batch
    got = _collect_summary(sink.summary(spark))
    want = _collect_summary(
        finish_order_summary(
            merge_partials([order_summary_partial(orders)], **_MERGE_KW)
        )
    )
    assert got == want

    # re-delivered batch id must be a no-op (double-fold double-counts)
    v = sink.version
    sink.process_batch(orders.limit(10), sink.last_batch_id)
    assert sink.version == v
    assert _collect_summary(sink.summary(spark)) == want


def test_merge_partials_requires_measures(spark):
    orders = table(spark, SF_DIR, "orders")
    with pytest.raises(ValueError):
        merge_partials([order_summary_partial(orders)], keys=["o_custkey"])


# --------------------------------------------------------------------------
# NFC normalization
# --------------------------------------------------------------------------


def test_nfc_goldens_non_ascii(spark, tmp_path, monkeypatch):
    """Composed and decomposed é normalize to identical md5; whitespace
    collapses; pure-ASCII single-spaced text is unchanged."""
    composed = "café au lait"
    decomposed = "café au lait"
    assert composed != decomposed  # distinct byte sequences, same NFC
    docs = spark.createDataFrame(
        [
            (1, composed, "fr", "web", len(composed)),
            (2, decomposed, "fr", "web", len(decomposed)),
            (3, "a  b\tc\n", "en", "web", 7),
            (4, "plain ascii", "en", "web", 11),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(d)
    out = {
        r["doc_id"]: r
        for r in q_normalize_text_nfc(spark, str(tmp_path)).collect()
    }
    # both forms → NFC "café au lait"
    want = hashlib.md5(
        unicodedata.normalize("NFC", composed).encode()
    ).hexdigest()
    assert out[1]["norm_md5"] == want
    assert out[2]["norm_md5"] == want
    assert not out[1]["changed"] and out[2]["changed"]
    assert out[1]["n_chars_norm"] == len(composed)
    assert out[3]["norm_md5"] == hashlib.md5(b"a b c").hexdigest()
    assert out[3]["changed"] and out[3]["n_chars_norm"] == 5
    assert not out[4]["changed"]


# --------------------------------------------------------------------------
# physical plans
# --------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_incremental_summary_plan_is_join_free(spark):
    plan = _plan(q_incremental_customer_summary(spark, SF_DIR))
    assert "Join" not in plan  # fold is union + re-aggregate, never a join


def test_temperature_weights_single_corpus_pass(spark):
    plan = _plan(q_temperature_mixture_weights(spark, SF_DIR))
    # ONE documents scan: the normalizer is a global window over the
    # |sources|-row aggregate (bounded by construction), never a
    # broadcast 1-row cross join whose subtree would re-scan the corpus
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "Window" in plan


def test_nfc_plan_is_arrow_batched_no_shuffle(spark):
    plan = _plan(q_normalize_text_nfc(spark, SF_DIR))
    assert "ArrowEvalPython" in plan  # pandas UDF, never row-at-a-time
    assert "PythonUDF" not in plan.replace("ArrowEvalPython", "")
    # pure projection: no aggregate/join shuffle; the only exchange
    # allowed is spread()'s explicit widening repartition — never a
    # plan-demanded (ENSURE_REQUIREMENTS) shuffle
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "REPARTITION_BY_NUM" in line


# --------------------------------------------------------------------------
# perceptual dHash
# --------------------------------------------------------------------------


def test_dhash_brightness_invariance_and_edit_stability(spark):
    """dHash is invariant to global brightness shifts and near-stable
    under one local edit; unrelated payloads differ widely."""
    import pandas as pd

    from sleep_edf_data_pipeline_spark.operators.multimodal import (
        dhash_assets,
    )

    base = bytes(range(40, 140)) * 2          # smooth ramp, 200 px
    brighter = bytes(min(b + 50, 255) for b in base)
    edited = bytearray(base)
    edited[10:13] = b"\x00\x00\x00"           # one local edit
    rng_other = bytes((b * 97 + 31) % 251 for b in base)

    rows = [
        ("base", "image", "fake/raw", base, len(base), 1),
        ("bright", "image", "fake/raw", brighter, len(base), 1),
        ("edited", "image", "fake/raw", bytes(edited), len(base), 1),
        ("other", "image", "fake/raw", rng_other, len(base), 1),
    ]
    assets = spark.createDataFrame(
        rows,
        "asset_id string, media_type string, format string, "
        "payload binary, width int, height int",
    )
    got = {
        r["asset_id"]: r["dhash"]
        for r in dhash_assets(assets, bits=32).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFF).count("1")

    assert got["base"] == got["bright"]            # brightness-shift invariant
    assert ham(got["base"], got["edited"]) <= 3    # local edit: few bits
    assert ham(got["base"], got["other"]) > 6      # unrelated: far apart
