"""Merge every query module's (QUERIES, ORACLES) for __spark_entry__."""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

#: Query modules, each exposing QUERIES and (optionally) ORACLES.
#:
#: ORDER MATTERS for the driver's correctness gate: it verifies the
#: first 50 entries of collect() per round, so the window rotates each
#: round.  Round-3 window (this ordering): the two never-driver-checked
#: extras, then the sleep/window spine whose arithmetic was rewritten
#: AFTER its r01 rows (fixed-point moving averages / z-scores), then
#: the longest-unverified TPC-H spine (r01 rows only) — extras(2) +
#: sleep_relational(10) + tpch_relational(16) + joins_advanced(6) +
#: relational_breadth(4) + event_windows(5) + advanced_windows(8,
#: window cuts at slot 50 inside it; ranking_suite grew the module
#: after this comment was first written).  serving.diagnostics,
#: r02-green, rotates just outside.  The LLM-training-data surface
#: (driver-green r02, CORRECTNESS_r02.json 50/50) rotates to the back;
#: everything stays covered every round by the local mirror in
#: tests/test_oracle_parity.py regardless of window position.
#: ROUND-4 ROTATION PLAN: put the round-3 debut modules first
#: (quantization_queries, corpus_quality, graph_stats' kcore,
#: multimodal_queries' resize, training_data, tpch_complete) so every
#: never-driver-checked query gets its row, then backfill with the
#: longest-unverified modules.
_MODULES = [
    "sleep_edf_data_pipeline_spark.queries.extras",
    "sleep_edf_data_pipeline_spark.queries.sleep_relational",
    "sleep_edf_data_pipeline_spark.queries.tpch_relational",
    "sleep_edf_data_pipeline_spark.queries.joins_advanced",
    "sleep_edf_data_pipeline_spark.queries.relational_breadth",
    "sleep_edf_data_pipeline_spark.queries.event_windows",
    "sleep_edf_data_pipeline_spark.queries.advanced_windows",
    "sleep_edf_data_pipeline_spark.queries.serving",
    "sleep_edf_data_pipeline_spark.queries.dedup_queries",
    "sleep_edf_data_pipeline_spark.queries.text_queries",
    "sleep_edf_data_pipeline_spark.queries.similarity_queries",
    "sleep_edf_data_pipeline_spark.queries.multimodal_queries",
    "sleep_edf_data_pipeline_spark.queries.corpus_prep",
    "sleep_edf_data_pipeline_spark.queries.corpus_filters",
    "sleep_edf_data_pipeline_spark.queries.tpch_deep",
    "sleep_edf_data_pipeline_spark.queries.behavior_analytics",
    "sleep_edf_data_pipeline_spark.queries.graph_stats",
    # Round-3 additions stay BEHIND the 50-entry window (slots 103+):
    # they get local parity + the sf0.1 sweep this round, and rotate
    # into the driver window next round per the policy above.
    "sleep_edf_data_pipeline_spark.queries.training_data",
    "sleep_edf_data_pipeline_spark.queries.tpch_complete",
    "sleep_edf_data_pipeline_spark.queries.quantization_queries",
    "sleep_edf_data_pipeline_spark.queries.corpus_quality",
]

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, fn in mod.QUERIES.items():
            if name in queries:
                raise ValueError(f"duplicate query name: {name} in {modname}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in mod.QUERIES:
                raise ValueError(f"oracle without query: {name} in {modname}")
            oracles[name] = sql
    return queries, oracles
