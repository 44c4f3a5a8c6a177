"""Round-8 pins: URL canonicalization folds + occupancy de-skew plan."""

import re

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_canonicalize_url_each_fold(spark):
    """Every fold rule, exercised one at a time on hand-written URLs."""
    from sleep_edf_data_pipeline_spark.operators.urls import canonicalize_url

    cases = [
        # (raw, canonical)
        ("http://a.com/x", "a.com/x"),
        ("https://a.com/x", "a.com/x"),                      # scheme fold
        ("http://A.Com/x", "a.com/x"),                       # host case
        ("http://www.a.com/x", "a.com/x"),                   # www strip
        ("http://a.com/x/", "a.com/x"),                      # trailing slash
        ("http://a.com/x#frag", "a.com/x"),                  # fragment
        ("http://a.com/X", "a.com/X"),                       # path case KEPT
        ("http://a.com/x?utm_source=f", "a.com/x"),          # tracking only
        ("http://a.com/x?b=2&a=1", "a.com/x?a=1&b=2"),       # param sort
        ("http://a.com/x?utm_medium=m&a=1&fbclid=z", "a.com/x?a=1"),
        ("http://a.com/x?ref=tw&gclid=g&mc_eid=e", "a.com/x"),
        ("http://a.com/", "a.com"),                          # root path
        ("http://a.com", "a.com"),                           # no path
        # 'reference=v' must NOT be stripped (anchored param-name match)
        ("http://a.com/x?reference=v", "a.com/x?reference=v"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], ["url"])
    got = [
        r["c"]
        for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [c for _, c in cases]


def test_url_dedup_groups_fold_all_variants(spark):
    """Each canonical group's raw variants must all fold: n_raw_variants
    equals n_copies everywhere (the synthesis makes every member's raw
    URL distinct), and group sizes are the doc_id div 3 triples."""
    from sleep_edf_data_pipeline_spark.queries.url_dedup import (
        q_url_canonical_dedup,
    )

    rows = q_url_canonical_dedup(spark, SF_DIR).collect()
    assert rows
    assert all(r["n_copies"] == r["n_raw_variants"] for r in rows)
    assert {r["n_copies"] for r in rows} <= {2, 3}
    assert sum(1 for r in rows if r["n_copies"] == 3) >= len(rows) - 1


def test_url_dedup_plan_is_scan_plus_one_aggregate(spark):
    """Map + hash-groupBy only: no joins, no windows, one exchange on
    the canonical key — the exact-content-dedup shuffle shape."""
    from sleep_edf_data_pipeline_spark.queries.url_dedup import (
        q_url_canonical_dedup,
    )

    plan = (
        q_url_canonical_dedup(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert "windowspecdefinition" not in plan, plan


def test_occupancy_rides_bucketed_sessionizer_and_caches_net(spark):
    """Round-8 de-skew pin: the sweep-line's deltas come from the
    (user, day)-bucketed sessionizer (no native MergingSessions — the
    hot-user merge task was the round-7 weak item), the netted delta
    grid is cached (InMemoryTableScan per consumer, counting what
    executes per the plan-text gotcha), and the cached subtree scans
    the events parquet exactly once (explode, not union)."""
    from sleep_edf_data_pipeline_spark.queries.occupancy import (
        q_peak_concurrent_sessions,
    )

    # other tests' persisted frames alias identical subtrees into this
    # plan as extra InMemoryTableScans — count from a clean cache
    spark.catalog.clearCache()
    plan = (
        q_peak_concurrent_sessions(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MergingSessions" not in plan, plan
    n_cached = plan.count("InMemoryTableScan")
    assert n_cached >= 2, plan
    # each InMemoryTableScan print inlines the cached subtree at most
    # once; AT MOST one events scan per print == one corpus pass at
    # cache-fill.  Upper bound, not equality — how Spark stringifies
    # inlined cached subtrees varies across versions (ADVICE r8).
    n_scans = len(re.findall(r"events\.parquet", plan))
    assert 1 <= n_scans <= n_cached, (n_scans, n_cached)


def test_bpe_encode_sample_reconstructs_tokens(spark):
    """Value-level encode invariants independent of the oracle: the
    pieces of every word concatenate back to the word exactly, every
    piece is 1 or 2 chars, and every 2-char piece is a trained merge."""
    from pyspark.sql import functions as F

    from sleep_edf_data_pipeline_spark.queries.tokenizer_apply import (
        merges_from_vocab,
        q_bpe_encode_sample,
        source_vocab,
    )
    from sleep_edf_data_pipeline_spark.tables import spread, table

    out = q_bpe_encode_sample(spark, SF_DIR)
    rebuilt = (
        out.groupBy("doc_id", "word_idx")
        .agg(
            F.concat_ws(
                "", F.array_sort(
                    F.collect_list(F.struct("piece_idx", "piece"))
                ).getField("piece")
            ).alias("word"),
            F.max(F.length("piece")).alias("max_piece"),
        )
    )
    docs = spread(table(spark, SF_DIR, "documents"), "doc_id")
    assert rebuilt.filter(F.col("max_piece") > 2).count() == 0
    # cross-check a sample of rebuilt words against the raw text.
    # The query's 1-based word_idx comes from Java \s+ split, which
    # keeps leading-empty tokens and only splits on ASCII whitespace —
    # rebuild the expected list the same way (re.split keeping
    # empties), never with Python str.split (ADVICE r8).
    some = rebuilt.limit(50).collect()
    texts = {
        r["doc_id"]: re.split(r"\s+", r["text"].lower())
        for r in docs.select("doc_id", "text").collect()
    }
    for r in some:
        assert texts[r["doc_id"]][r["word_idx"] - 1] == r["word"]
    # every 2-char piece is a trained merge
    merges = set(
        merges_from_vocab(source_vocab(docs)).collect()[0]["merges"]
    )
    two_char = {
        r["piece"]
        for r in out.filter(F.length("piece") == 2).distinct().collect()
    }
    assert two_char <= merges


def test_host_profile_plan_shape(spark):
    """Two host-key aggregations + a 1-row broadcast — never a
    shuffle join or a window."""
    from sleep_edf_data_pipeline_spark.queries.url_dedup import (
        q_host_dedup_profile,
    )

    spark.catalog.clearCache()
    plan = (
        q_host_dedup_profile(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    assert "windowspecdefinition" not in plan, plan
    # the per-host grid is cached: output AND the 1-row total read the
    # InMemoryTableScan, so the corpus is scanned once at cache-fill
    assert plan.count("InMemoryTableScan") >= 2, plan
