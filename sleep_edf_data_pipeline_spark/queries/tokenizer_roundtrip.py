"""Round-12: BPE + WordPiece train → persist → apply roundtrips.

Completes the tokenizer-triad roundtrip family begun by
``unigram_lm_roundtrip_stats`` (VERDICT r11 item 6): each trainer's
model is committed through ``writers/versioned.py`` (the S7
transactional path — staged parquet + CAS marker), and the encode
stage is then driven ONLY by the committed snapshot.  The oracle is
the monolithic query's SQL verbatim, so hash equality proves the
persisted artifact is value-identical to never having persisted.

Artifacts (both vocab-sized, O(1) in the corpus):

- **BPE**: the trained merge table, one row per merged pair
  (pair, pair_count) — the inspectable production shape (a merges.txt
  analog).  The apply stage re-collapses the committed rows into the
  1-row bounded array frame the shared fold
  (``tokenizer_apply.encode_stats_from_merges``) broadcasts.
- **WordPiece**: one row per vocabulary piece.  The greedy encoder's
  per-length membership arrays are order-insensitive, so read-back
  order cannot perturb the encode.

Scale shape: identical to the monolithic forms — the corpus-scale work
(the vocabulary/word grids and the encode fold) is unchanged; the
persist/read steps touch only the model (64 pairs / WP_PIECES rows).

Reference scope: the persisted-model apply mirrors the reference's
train-once/serve-many mart pattern (dbt models materialized to the
warehouse, read by serving queries — models/marts/, SURVEY §2.5);
the tokenizers extend §2.7 per the build brief.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import spread, table, table_fingerprint
from ..writers.versioned import (
    commit_versioned,
    current_version,
    read_versioned,
)
from .tokenizer_apply import (
    ORACLE_BPE_ENCODE_STATS,
    encode_stats_from_merges,
    merges_from_vocab,
    source_vocab,
)
from .wordpiece import (
    ORACLE_WORDPIECE_ENCODE_STATS,
    _words,
    encode_stats_from_pieces,
    train_wordpiece_vocab,
)


def _model_path(sf_dir: str, kind: str) -> str:
    """Deterministic per-(corpus, trainer) versioned-table location
    under /tmp (content-fingerprint keyed, the storage_roundtrip
    discipline: repeat runs stack versions on one table)."""
    fp = hashlib.md5(
        repr(table_fingerprint(sf_dir, "documents")).encode()
    ).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), f"sleep_edf_{kind}_model_{fp}"
    )


def q_bpe_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(table(spark, sf_dir, "documents"), "doc_id")
    vocab = source_vocab(docs).persist()
    # TRAIN: explode the bounded 1-row merge array into the
    # inspectable per-pair artifact and commit it
    model_df = (
        merges_from_vocab(vocab)
        .select(F.explode("merges").alias("pair"))
        .withColumn("pair_len", F.length("pair").cast("int"))
    )
    path = _model_path(sf_dir, "bpe")
    version = commit_versioned(model_df, path, current_version(path))
    # APPLY: only the committed snapshot feeds the encode fold
    artifact = read_versioned(spark, path, version)
    merge_arr = artifact.agg(
        F.sort_array(F.collect_list("pair")).alias("merges")
    )
    return encode_stats_from_merges(vocab, merge_arr)


def q_wordpiece_roundtrip_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    words = _words(spark, sf_dir)
    pieces = train_wordpiece_vocab(words)
    model_df = spark.createDataFrame(
        [(g, len(g)) for g in pieces], "piece string, piece_len int"
    )
    path = _model_path(sf_dir, "wordpiece")
    version = commit_versioned(model_df, path, current_version(path))
    artifact = read_versioned(spark, path, version)
    # vocab-sized bounded collect; membership arrays are
    # order-insensitive so read-back order is irrelevant
    vocab_rt = [r["piece"] for r in artifact.collect()]
    return encode_stats_from_pieces(words, vocab_rt)


QUERIES = {
    "bpe_roundtrip_stats": q_bpe_roundtrip_stats,
    "wordpiece_roundtrip_stats": q_wordpiece_roundtrip_stats,
}

# The monolithic applies' oracles, verbatim: each roundtrip must be
# value-identical to never having persisted at all.
ORACLES = {
    "bpe_roundtrip_stats": ORACLE_BPE_ENCODE_STATS,
    "wordpiece_roundtrip_stats": ORACLE_WORDPIECE_ENCODE_STATS,
}
