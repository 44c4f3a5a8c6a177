"""Round-12: tokenizer train → persist → apply roundtrip.

The three trainers (BPE, WordPiece, unigram-LM) emit vocabulary
DataFrames, but until this query nothing round-tripped a trained model
through a persisted artifact back into the encode stage — the
production shape (train once, apply for months) the reference's
warehouse embodies for its marts (VERDICT r11 item 6).

Composition of already-green kernels, no new math:

1. TRAIN — ``unigram_lm._train`` (the fixed-2-iteration hard-EM
   trainer behind both driver-green unigram queries) produces the
   model: piece → (count, prob).
2. PERSIST — the model is committed through ``writers/versioned.py``
   (the S7 transactional path: staged parquet + CAS marker), the same
   machinery the serving marts and streaming monitors use.  The table
   accrues a version per training run; the apply stage pins the
   version it just committed (time travel = reproducible apply).
3. APPLY — the committed snapshot is read back, and ONLY its rows
   drive ``unigram_lm._encode_stats`` (the shared apply stage of
   ``unigram_lm_encode_stats``).

The oracle is the monolithic ``unigram_lm_encode_stats`` SQL verbatim:
hash equality proves the artifact carried the model LOSSLESSLY —
``prob`` is a float64 column in parquet, so the read-back doubles are
bit-identical to the in-memory dict and the Viterbi tie-breaks cannot
drift.

Scale shape (100 TB): the artifact is vocab-sized (hundreds of rows),
so the persist/read/collect steps are O(vocab) regardless of corpus;
the corpus-scale work (wfreq build + segmentation) is identical to the
monolithic form.  On a cluster the versioned-table path takes any
Hadoop-FS URI; locally it stages under /tmp keyed on the corpus
fingerprint (the ``storage_roundtrip`` discipline) so repeated runs
stack versions on ONE table instead of accreting directories.

Reference scope: persisted-model apply mirrors the reference's
train-once/serve-many mart pattern (dbt models materialized to the
warehouse, read by serving queries — models/marts/, SURVEY §2.5);
the tokenizer itself extends §2.7 per the build brief.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..tables import table_fingerprint
from ..writers.versioned import (
    commit_versioned,
    current_version,
    read_versioned,
)
from .unigram_lm import _encode_stats, _train
from .unigram_lm import ORACLE_UNIGRAM_LM_ENCODE_STATS


def _model_path(sf_dir: str) -> str:
    """Deterministic per-corpus versioned-table location under /tmp
    (content-fingerprint keyed, the storage_roundtrip discipline)."""
    fp = hashlib.md5(
        repr(table_fingerprint(sf_dir, "documents")).encode()
    ).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), f"sleep_edf_unigram_model_{fp}"
    )


def q_unigram_lm_roundtrip_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    wfreq, counts, probs, words = _train(spark, sf_dir)
    model_df = spark.createDataFrame(
        [(p, counts[p], probs[p]) for p in sorted(counts)],
        "piece string, count bigint, prob double",
    )
    path = _model_path(sf_dir)
    version = commit_versioned(model_df, path, current_version(path))
    # The apply stage sees ONLY the committed snapshot (pinned to the
    # version just written — a concurrent trainer cannot tear it).
    artifact = read_versioned(spark, path, version)
    probs_rt = {r["piece"]: r["prob"] for r in artifact.collect()}
    return _encode_stats(wfreq, words, probs_rt)


QUERIES = {
    "unigram_lm_roundtrip_stats": q_unigram_lm_roundtrip_stats,
}

# The monolithic apply's oracle, verbatim: the roundtrip must be
# value-identical to never having persisted at all.
ORACLES = {
    "unigram_lm_roundtrip_stats": ORACLE_UNIGRAM_LM_ENCODE_STATS,
}
