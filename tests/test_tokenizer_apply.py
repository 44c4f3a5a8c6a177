"""Round-7: BPE-apply (greedy vocabulary encode) — semantics + plan.

The fold inside ``bpe_encode_stats`` is a sequential greedy scan
re-expressed as a JVM-side ``aggregate()``; these tests check it
against a direct Python reference implementation of the same greedy
rule on synthetic words, and pin the plan's scale shape (encode over
the VOCABULARY with a broadcast merge array — never a corpus-row fold
fan-out or a fact-scale join).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.queries import tokenizer_apply as ta


def greedy_encode(word: str, merges: set[str]) -> tuple[int, int]:
    """Reference greedy scan: (tokens emitted, merged-pair tokens)."""
    pos, n_tok, n_pair = 0, 0, 0
    while pos < len(word):
        if word[pos : pos + 2] in merges:
            pos, n_tok, n_pair = pos + 2, n_tok + 1, n_pair + 1
        else:
            pos, n_tok = pos + 1, n_tok + 1
    return n_tok, n_pair


WORDS = [
    "aaa",          # odd repeat of a merge char: aa + a
    "aaaa",         # even repeat: aa + aa
    "abab",         # alternating merge: ab + ab
    "xabay",        # merge mid-word: x + ab + a + y
    "z",            # single char, no merge possible
    "aabb",         # two distinct merges back to back
    "baaab",        # greedy takes aa at pos 2, leaving a + b
]
MERGES = {"aa", "ab", "bb"}


@pytest.mark.parametrize("word", WORDS)
def test_fold_matches_python_reference(spark, word):
    df = (
        spark.createDataFrame([(word,)], "tok string")
        .withColumn(
            "merges",
            F.array(*[F.lit(m) for m in sorted(MERGES)]),
        )
        .select(F.expr(ta._ENCODE_FOLD).alias("st"))
    )
    row = df.collect()[0]["st"]
    want_tok, want_pair = greedy_encode(word, MERGES)
    assert (row["n_tok"], row["n_pair"]) == (want_tok, want_pair)
    # the scan must consume the whole word
    assert row["pos"] > len(word)


def test_encode_stats_invariants(spark, sf_dir):
    rows = ta.q_bpe_encode_stats(spark, sf_dir).collect()
    assert rows, "at least one source"
    for r in rows:
        # every emitted pair token consumes 2 chars, singles consume 1
        assert r["n_chars"] == r["n_tokens"] + r["n_pair_tokens"]
        # encode can never emit more tokens than characters, nor fewer
        # than half
        assert r["n_tokens"] <= r["n_chars"] <= 2 * r["n_tokens"]
        assert 1.0 <= r["chars_per_token"] <= 2.0
        assert r["n_words"] >= r["vocab_size"] > 0


def test_encode_plan_shape(spark, sf_dir):
    plan = (
        ta.q_bpe_encode_stats(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # merge table rides a broadcast, never a shuffle join against the
    # vocabulary
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    # the training cut stays TakeOrderedAndProject (no global sort of
    # the pair space)
    assert "TakeOrderedAndProject" in plan
    # the (source, tok) grid is persisted and feeds BOTH the encode
    # side and the training side: what executes downstream is the
    # InMemoryTableScan, so the corpus is tokenized ONCE (plan text
    # inlines the cached subtree per consumer — count the cache scan,
    # not "Scan parquet")
    assert "InMemoryTableScan" in plan


def test_streaming_vocab_monitor_matches_batch(spark, sf_dir, tmp_path):
    """Replaying the documents table through the foreachBatch vocab
    monitor in multiple micro-batches must fold to the EXACT batch
    vocabulary grid (algebraic exactness), and train+apply from the
    folded state must equal the batch query row for row.  Re-delivered
    batches must not double-count."""
    from sleep_edf_data_pipeline_spark.streaming.bpe import (
        StreamingVocabMonitor,
    )
    from sleep_edf_data_pipeline_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)
    mon = StreamingVocabMonitor(str(tmp_path / "vocab_state"))
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(mon.process_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert mon.last_batch_id is not None and mon.last_batch_id >= 1

    got_grid = sorted(map(tuple, mon.vocab(spark).collect()))
    want_grid = sorted(map(tuple, ta.source_vocab(docs).collect()))
    assert got_grid == want_grid

    got = sorted(map(tuple, mon.encode_stats(spark).collect()))
    want = sorted(
        map(tuple, ta.q_bpe_encode_stats(spark, sf_dir).collect())
    )
    assert got == want

    # at-least-once re-delivery: same batch id again is a no-op
    v = mon.version
    mon.process_batch(docs, mon.last_batch_id)
    assert mon.version == v
    assert sorted(map(tuple, mon.vocab(spark).collect())) == got_grid

    # repeated answers leave no cached frames (r10 leak-free pin)
    spark.catalog.clearCache()
    jcat = spark._jsparkSession.sharedState().cacheManager()
    for _ in range(2):
        mon.encode_stats(spark).collect()
    assert jcat.isEmpty(), "monitor answers leaked cached frames"
