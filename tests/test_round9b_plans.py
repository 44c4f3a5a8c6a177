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
