"""Round-11: unigram-LM tokenizer trainer — invariants + plan shape.

The cross-engine hash match is covered by tests/test_oracle_parity.py
(both queries are oracle-backed); these tests pin the ALGORITHMIC
invariants that the hash alone can't localize when it breaks, and the
plan shape that keeps the trainer 100 TB-safe.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_vocab_and_stats_reconcile_exactly(spark):
    """Conservation laws tying the two registered queries together:
    the final Viterbi segmentation covers every character of every
    word occurrence exactly once, so

      Σ count_viterbi · piece_len  ==  Σ n_chars   (total corpus chars)
      Σ count_viterbi              ==  Σ n_pieces  (total pieces)
    """
    from sleep_edf_data_pipeline_spark.queries.unigram_lm import (
        q_unigram_lm_encode_stats,
        q_unigram_lm_vocab,
    )

    spark.catalog.clearCache()
    vocab = q_unigram_lm_vocab(spark, SF_DIR).collect()
    spark.catalog.clearCache()
    stats = q_unigram_lm_encode_stats(spark, SF_DIR).collect()
    spark.catalog.clearCache()

    chars_from_vocab = sum(r["count_viterbi"] * r["piece_len"] for r in vocab)
    pieces_from_vocab = sum(r["count_viterbi"] for r in vocab)
    assert chars_from_vocab == sum(r["n_chars"] for r in stats)
    assert pieces_from_vocab == sum(r["n_pieces"] for r in stats)


def test_vocab_invariants(spark):
    """Single-char coverage tier survives pruning (byte-fallback
    analog); probabilities are a distribution; ordering is the pinned
    deterministic (count DESC, piece ASC)."""
    from sleep_edf_data_pipeline_spark.queries.unigram_lm import (
        UNI_LENS,
        q_unigram_lm_vocab,
    )

    spark.catalog.clearCache()
    rows = q_unigram_lm_vocab(spark, SF_DIR).collect()
    spark.catalog.clearCache()
    assert rows
    assert all(r["piece_len"] in UNI_LENS for r in rows)
    assert all(len(r["piece"]) == r["piece_len"] for r in rows)
    # smoothing: singles floored at +1, so every single has prob > 0
    singles = [r for r in rows if r["piece_len"] == 1]
    assert singles and all(r["count_smoothed"] >= 1 for r in singles)
    assert abs(sum(r["prob"] for r in rows) - 1.0) < 1e-9
    keys = [(-r["count_viterbi"], r["piece"]) for r in rows]
    assert keys == sorted(keys)


def test_longest_piece_wins_ties(spark):
    """Tie-break pin: when a word IS a vocabulary piece whose product
    score ties a multi-piece split, the single longest piece wins —
    segmenting a word that is itself a top piece yields one piece."""
    from sleep_edf_data_pipeline_spark.queries.unigram_lm import (
        _backtrace_pieces,
        _map_literal,
        _viterbi_states,
    )

    probs = {"ab": 0.25, "a": 0.5, "b": 0.5}  # ab == a·b exactly
    df = spark.createDataFrame([("ab",)], "w string")
    w = F.col("w")
    states = _viterbi_states(_map_literal(probs), w)
    got = df.select(_backtrace_pieces(states, w).alias("ps")).collect()
    assert got[0]["ps"] == ["ab"]


def test_trainer_plan_shape(spark):
    """Scale pins: no cartesian product, no sort-merge join (the only
    join is the vocab-sized broadcast), and the E-step aggregation
    partial-aggregates map-side (HashAggregate appears below the
    exchange)."""
    from sleep_edf_data_pipeline_spark.queries.unigram_lm import (
        q_unigram_lm_vocab,
    )

    spark.catalog.clearCache()
    plan = _plan(q_unigram_lm_vocab(spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_seed_cap_overflow_raises(spark):
    """ADVICE r11: past SEED_SINGLES_CAP distinct characters the
    coverage invariant ("every char is seeded, no word can fail to
    segment") breaks and the two engines' substr semantics diverge in
    the all-zero Viterbi tie — the trainer must fail loudly instead of
    returning cross-engine-unstable output."""
    import pytest

    from sleep_edf_data_pipeline_spark.queries.unigram_lm import (
        SEED_SINGLES_CAP,
        _seed_vocab,
    )

    chars = [chr(0x4E00 + i) for i in range(SEED_SINGLES_CAP + 8)]
    wfreq = spark.createDataFrame(
        [(c, 1) for c in chars], "w string, freq bigint"
    )
    with pytest.raises(ValueError, match="distinct characters"):
        _seed_vocab(wfreq)


def test_seed_cap_boundary_is_exact(spark):
    """Exactly SEED_SINGLES_CAP distinct characters still trains (the
    +1-row probe must not false-positive at the boundary)."""
    from sleep_edf_data_pipeline_spark.queries.unigram_lm import (
        SEED_SINGLES_CAP,
        _seed_vocab,
    )

    chars = [chr(0x4E00 + i) for i in range(SEED_SINGLES_CAP)]
    wfreq = spark.createDataFrame(
        [(c, 1) for c in chars], "w string, freq bigint"
    )
    vocab = _seed_vocab(wfreq)
    assert len([p for p in vocab if len(p) == 1]) == SEED_SINGLES_CAP
