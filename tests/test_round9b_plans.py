"""Round-9 late-batch pins: SQ8 search, readability, n-gram novelty."""

import re

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sq_topk_plan_shape(spark):
    """The compressed-scan contract: the corpus-wide distance pass runs
    over the int codes with the 8-query frame broadcast (nested-loop
    broadcast, never a CartesianProduct); the exact float re-rank joins
    embeddings only for the bounded shortlist (broadcast hash joins);
    ranking windows are partitioned on query_id (adc_topk family
    shape)."""
    from sleep_edf_data_pipeline_spark.queries.quantization_sq import (
        q_sq_topk_rescore,
    )

    spark.catalog.clearCache()
    plan = _plan(q_sq_topk_rescore(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    # shortlist + qvec re-attach stay broadcast — the corpus side never
    # shuffles for a join
    assert "SortMergeJoin" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("query_id" in s for s in specs), plan
    # stats collect happens before this plan; the final query reads the
    # embeddings parquet a bounded number of times (codes, query codes,
    # shortlist vectors, query vectors)
    assert len(re.findall(r"embeddings\.parquet", plan)) <= 4, plan


def test_sq_recall_saturates_at_shortlist(spark):
    """int8-per-dim codes rank well enough that the R=80 shortlist
    recovers the exact top-5 perfectly on the synthetic corpus — the
    measured claim in the module docstring."""
    from sleep_edf_data_pipeline_spark.queries.quantization_sq import (
        q_sq_recall_eval,
    )

    rows = q_sq_recall_eval(spark, SF_DIR).collect()
    assert len(rows) == 8
    assert all(r["n_hit"] == 5 and r["recall_sq"] == 1.0 for r in rows)


def test_sq_codes_are_bytes(spark):
    """Every code is in [0, 255] and every vector encodes to 64 codes —
    the 4x-compression invariant the scan-bandwidth argument rests on."""
    from sleep_edf_data_pipeline_spark.queries.quantization_sq import (
        SQ_DIM,
        _train_minmax,
        sq_encode,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    emb = table(spark, SF_DIR, "embeddings")
    mins, maxs = _train_minmax(emb)
    assert len(mins) == SQ_DIM and len(maxs) == SQ_DIM
    assert all(mx > mn for mn, mx in zip(mins, maxs))
    bad = (
        sq_encode(emb, mins, maxs)
        .select(
            F.size("codes").alias("n"),
            F.array_min("codes").alias("lo"),
            F.array_max("codes").alias("hi"),
        )
        .filter(
            (F.col("n") != SQ_DIM) | (F.col("lo") < 0) | (F.col("hi") > 255)
        )
        .count()
    )
    assert bad == 0


def test_readability_plan_shape(spark):
    """ONE corpus pass, no joins, no windows: every feature is a
    codegen projection; the only shuffles are the spread() repartition
    and the tiny per-source aggregation.  Scan prunes to
    (doc_id, text, source)."""
    from sleep_edf_data_pipeline_spark.queries.readability import (
        q_readability_scores,
    )

    spark.catalog.clearCache()
    plan = _plan(q_readability_scores(spark, SF_DIR))
    assert len(re.findall(r"documents\.parquet", plan)) == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert re.search(
        r"ReadSchema: struct<doc_id:bigint,text:string,source:string>", plan
    ), plan


def test_readability_values_plausible(spark):
    """Structural invariants of the fixed-point pipeline: doc counts
    conserve, words-per-sentence >= 1, syllables-per-word in [1, 8]
    (every word contributes >= 1), and the no-punctuation corpus makes
    wps equal the doc word count (sentences floor at 1)."""
    from sleep_edf_data_pipeline_spark.queries.readability import (
        q_readability_scores,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    out = q_readability_scores(spark, SF_DIR).collect()
    n_docs = table(spark, SF_DIR, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs
    for r in out:
        assert r["avg_words_per_sentence"] >= 1.0
        assert 1.0 <= r["avg_syllables_per_word"] <= 8.0
        # no punctuation in the synthetic corpus: one sentence per doc,
        # so avg wps == avg words per doc
        assert abs(
            r["avg_words_per_sentence"] - r["n_words"] / r["n_docs"]
        ) < 1.0


def test_ngram_novelty_plan_shape(spark):
    """line_dedup shuffle shape at trigram grain: one scan, zero joins,
    the argmin window partitioned on the 60-bit hash."""
    from sleep_edf_data_pipeline_spark.queries.novelty import q_ngram_novelty

    spark.catalog.clearCache()
    plan = _plan(q_ngram_novelty(spark, SF_DIR))
    assert len(re.findall(r"documents\.parquet", plan)) == 1, plan
    assert "Join" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all("tri_hash" in s for s in specs), plan
    assert re.search(r"ReadSchema: struct<doc_id:bigint,text:string>", plan), (
        plan
    )


def test_ngram_novelty_attribution_conserves(spark):
    """Every distinct trigram is charged to exactly one document:
    sum(n_novel) == corpus-distinct trigram count (independently
    re-derived), and 0 <= n_novel <= n_trigrams per doc."""
    from sleep_edf_data_pipeline_spark.operators.dedup import (
        tokens,
        word_shingles,
    )
    from sleep_edf_data_pipeline_spark.queries.novelty import (
        NGRAM_N,
        q_ngram_novelty,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    out = q_ngram_novelty(spark, SF_DIR)
    bad = out.filter(
        (F.col("n_novel") < 0)
        | (F.col("n_novel") > F.col("n_trigrams"))
        | (F.col("novel_pct") < 0)
        | (F.col("novel_pct") > 1)
    )
    assert bad.count() == 0
    total_novel = out.agg(F.sum("n_novel")).collect()[0][0]
    distinct_tris = (
        table(spark, SF_DIR, "documents")
        .select(
            F.explode(
                word_shingles(tokens(F.col("text")), NGRAM_N)
            ).alias("tri")
        )
        .distinct()
        .count()
    )
    assert total_novel == distinct_tris


def test_wordpiece_plan_shape(spark):
    """The apply pass is join-free: one documents scan, the vocabulary
    folded to literals, a JVM fold per word, then the tiny per-source
    aggregation.  (The train pass runs eagerly before this plan via
    TakeOrdered + collect.)"""
    from sleep_edf_data_pipeline_spark.queries.wordpiece import (
        q_wordpiece_encode_stats,
    )

    spark.catalog.clearCache()
    plan = _plan(q_wordpiece_encode_stats(spark, SF_DIR))
    assert len(re.findall(r"documents\.parquet", plan)) == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert re.search(
        r"ReadSchema: struct<doc_id:bigint,text:string,source:string>", plan
    ), plan


def test_wordpiece_greedy_semantics(spark):
    """Greedy maximal munch on a known word/vocab: 'interconnect' with
    pieces {inte, rcon, nec} segments inte|rcon|nec|t = 4 pieces (the
    length-4 match wins over any shorter prefix at each step)."""
    from pyspark.sql import functions as F

    from sleep_edf_data_pipeline_spark.queries import wordpiece as W

    df = spark.createDataFrame([("interconnect",), ("ab",), ("x",)], "w string")
    st = W._encode_state(["inte", "rcon", "nec", "ab"])
    out = {
        r["w"]: r["np"]
        for r in df.select("w", st.getField("np").alias("np")).collect()
    }
    assert out == {"interconnect": 4, "ab": 1, "x": 1}


def test_wordpiece_stats_invariants(spark):
    """Per source: words <= pieces <= chars (every word >= 1 piece,
    every piece >= 1 char), single-piece words <= words, and the
    vocabulary is deterministic (two trainings agree)."""
    from sleep_edf_data_pipeline_spark.queries.wordpiece import (
        _words,
        q_wordpiece_encode_stats,
        train_wordpiece_vocab,
    )

    rows = q_wordpiece_encode_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_words"] <= r["n_pieces"] <= r["n_chars"]
        assert r["single_piece_words"] <= r["n_words"]
    v1 = train_wordpiece_vocab(_words(spark, SF_DIR))
    v2 = train_wordpiece_vocab(_words(spark, SF_DIR))
    assert v1 == v2 and len(v1) == 120


def test_edge_similarity_plan_shape(spark):
    """The triangle-family probe shape: adjacency broadcast at this
    scale (entry count under the threshold), per-edge intersection in
    codegen, no CartesianProduct, no sort-merge join of anything
    corpus-sized."""
    from sleep_edf_data_pipeline_spark.queries.link_prediction import (
        q_edge_similarity_scores,
    )

    spark.catalog.clearCache()
    plan = _plan(q_edge_similarity_scores(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "array_intersect" in plan, plan


def test_edge_similarity_cross_invariants(spark):
    """Score-sheet sanity pinned against independent derivations:
    sum(cn) over edges == 3 x total triangles (each triangle
    contributes one common neighbor to each of its three edges);
    cn <= min(deg)-1; jaccard in [0, 1); RA <= cn/2 * 1e-6-floored
    (every common neighbor has degree >= 2)."""
    from pyspark.sql import functions as F

    from sleep_edf_data_pipeline_spark.queries.graph_stats import (
        q_triangle_counts,
    )
    from sleep_edf_data_pipeline_spark.queries.link_prediction import (
        q_edge_similarity_scores,
    )

    out = q_edge_similarity_scores(spark, SF_DIR).persist()
    bad = out.filter(
        (F.col("cn") > F.least("deg_u", "deg_v") - 1)
        | (F.col("jaccard") < 0)
        | (F.col("jaccard") >= 1)
        | (F.col("resource_alloc") > F.col("cn") / 2.0)
        | ((F.col("cn") > 0) & (F.col("resource_alloc") <= 0))
    )
    assert bad.count() == 0
    sum_cn = out.agg(F.sum("cn")).collect()[0][0]
    tri3 = (
        q_triangle_counts(spark, SF_DIR).agg(F.sum("n_triangles")).collect()
    )[0][0]
    out.unpersist()
    spark.catalog.clearCache()
    assert sum_cn == tri3  # per-part counts already sum to 3T


def test_zorder_plan_shape(spark):
    """Both layouts off ONE orders scan (plus the broadcast 1-row
    stats agg): no windows, no sort-merge joins, the stats attach is a
    broadcast nested-loop of a single row."""
    from sleep_edf_data_pipeline_spark.queries.layout import (
        q_zorder_layout_stats,
    )

    spark.catalog.clearCache()
    plan = _plan(q_zorder_layout_stats(spark, SF_DIR))
    assert len(re.findall(r"orders\.parquet", plan)) == 2, plan  # data + stats
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_zorder_prunes_both_dimensions(spark):
    """The layout trade the module exists to demonstrate, pinned:
    under the linear (custkey-range) layout the per-bucket day span is
    ~the full domain; under Z-order BOTH spans are bounded well below
    it.  Also: rows conserve per layout and buckets stay in range."""
    from pyspark.sql import functions as F

    from sleep_edf_data_pipeline_spark.queries.layout import (
        N_FILES,
        q_zorder_layout_stats,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    rows = q_zorder_layout_stats(spark, SF_DIR).collect()
    n_orders = table(spark, SF_DIR, "orders").count()
    by_layout = {}
    for r in rows:
        by_layout.setdefault(r["layout"], []).append(r)
        assert 0 <= r["bucket"] < N_FILES
    for lay, rs in by_layout.items():
        assert sum(r["n_rows"] for r in rs) == n_orders, lay

    def avg_span(rs, lo, hi):
        return sum(r[hi] - r[lo] for r in rs) / len(rs)

    lin, zo = by_layout["linear"], by_layout["zorder"]
    day_domain = max(r["day_max"] for r in rows) - min(
        r["day_min"] for r in rows
    )
    # linear: day unclustered (span ≈ the whole domain); zorder: both
    # dimensions bounded — day span at most half the domain, and far
    # below linear's
    assert avg_span(lin, "day_min", "day_max") > 0.8 * day_domain
    assert avg_span(zo, "day_min", "day_max") < 0.5 * day_domain
    assert avg_span(zo, "day_min", "day_max") < 0.5 * avg_span(
        lin, "day_min", "day_max"
    )
    # the trade: zorder gives up custkey tightness vs linear
    assert avg_span(zo, "ck_min", "ck_max") > avg_span(
        lin, "ck_min", "ck_max"
    )


def test_pareto_plan_decomposes_prefix(spark):
    """No corpus-sized unpartitioned window: ordered specs are either
    partitioned (per-price argmax on cents, within-bucket running max
    on bkt) or run over the constant-bounded bucket-maxima frame; the
    prefix re-attach is a broadcast join."""
    from sleep_edf_data_pipeline_spark.queries.skyline import (
        q_pareto_frontier,
    )

    spark.catalog.clearCache()
    plan = _plan(q_pareto_frontier(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    # In spec text, order columns carry ASC/DESC markers; partition
    # columns are the bare leading args.  A spec whose FIRST arg is an
    # order column has no partition key at all.
    def is_order_col(tok):
        return " ASC" in tok or " DESC" in tok

    unpartitioned = []
    for s in specs:
        toks = [t.strip() for t in s.split(",")]
        if is_order_col(toks[0]):
            unpartitioned.append(toks)
        else:
            # partitioned spec: its keys must be the bucket/price
            # decomposition, never the raw corpus unkeyed
            assert "cents" in toks[0] or "bkt" in toks[0], s
    # the ONLY unpartitioned window is the cross-bucket prefix,
    # ordered on bkt alone (<=256 rows) — a global window ordered on
    # cents (the naive corpus-sized single-task plan) must fail here
    assert len(unpartitioned) == 1, plan
    order_cols = [t for t in unpartitioned[0] if is_order_col(t)]
    assert order_cols and all(
        "bkt" in t and "cents" not in t for t in order_cols
    ), plan


def test_pareto_frontier_is_nondominated(spark):
    """Every frontier point survives a full-corpus domination check
    (no row is cheaper with >= quantity, or <= price with more
    quantity), the frontier is strictly monotone in BOTH dimensions,
    and every frontier point exists in the corpus."""
    from pyspark.sql import functions as F

    from sleep_edf_data_pipeline_spark.queries.skyline import (
        q_pareto_frontier,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    rows = sorted(
        q_pareto_frontier(spark, SF_DIR).collect(), key=lambda r: r["price"]
    )
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert a["price"] < b["price"] and a["quantity"] < b["quantity"]

    li = table(spark, SF_DIR, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    for r in rows:
        cents = int(round(r["price"] * 100))
        dominating = li.filter(
            (
                (F.col("cents") < cents) & (F.col("qty") >= r["quantity"])
            )
            | ((F.col("cents") <= cents) & (F.col("qty") > r["quantity"]))
        ).count()
        assert dominating == 0, r
        assert (
            li.filter(
                (F.col("cents") == cents) & (F.col("qty") == r["quantity"])
            ).count()
            == r["n_offers"]
        )


def test_chi2_plan_shape(spark):
    """ONE documents scan feeds the (source, bucket) reduce; all later
    frames are grid-sized; stats/grid attaches are broadcasts; no
    windows."""
    from sleep_edf_data_pipeline_spark.queries.chi2_drift import (
        q_chi2_drift_by_source,
    )

    spark.catalog.clearCache()
    plan = _plan(q_chi2_drift_by_source(spark, SF_DIR))
    # the reduced (source, bucket) frame is persisted: consumers read
    # InMemoryTableScan, so the corpus parquet appears only inside the
    # cached subtree prints (2 scans: bucket pass + stats agg)
    assert "InMemoryTableScan" in plan, plan
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_chi2_statistical_sanity(spark):
    """The synthetic sources draw from one n_chars distribution, so
    per-source chi2 should hover near its df (buckets-1), far below
    the 0.001 critical value (27.88 at df=9) — and the micro-exact sum
    must be non-negative with every source present."""
    from sleep_edf_data_pipeline_spark.queries.chi2_drift import (
        q_chi2_drift_by_source,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    rows = q_chi2_drift_by_source(spark, SF_DIR).collect()
    n_sources = (
        table(spark, SF_DIR, "documents").select("source").distinct().count()
    )
    assert len(rows) == n_sources
    for r in rows:
        assert r["chi2"] >= 0
        assert r["n_buckets"] == 10
        assert r["chi2"] < 27.88, r  # no source actually drifts


def test_priority_sample_plan_shape(spark):
    """The k+1 cut compiles to TakeOrderedAndProject (never a global
    sort-exchange of the fact table); the totals attach is a broadcast
    of one row."""
    from sleep_edf_data_pipeline_spark.queries.sampling_advanced import (
        q_priority_sample_estimate,
    )

    spark.catalog.clearCache()
    plan = _plan(q_priority_sample_estimate(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_priority_sample_estimator_identities(spark):
    """DLT structural checks: sample_size == k (population >> k), τ > 0,
    every estimate term >= its weight (so est >= the sample's raw
    weight sum), and the estimate lands within a generous
    O(1/sqrt(k)) band of the exact total on near-uniform weights."""
    from sleep_edf_data_pipeline_spark.queries.sampling_advanced import (
        PS_K,
        q_priority_sample_estimate,
    )

    r = q_priority_sample_estimate(spark, SF_DIR).collect()
    assert len(r) == 1
    r = r[0]
    assert r["k"] == PS_K and r["sample_size"] == PS_K
    assert r["n_items"] > PS_K
    assert r["tau"] > 0
    assert r["est_cents"] > 0
    # near-uniform weights, k=256 -> sigma ~ 1/sqrt(k) ~ 6%; allow 4x
    assert abs(r["rel_err"]) < 0.25, r
