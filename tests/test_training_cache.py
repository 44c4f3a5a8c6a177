"""Training-artifact memo invalidation (quantization_queries).

The PQ/IVF codebook memos must be keyed by corpus CONTENT, not path:
if the parquet under a path is rewritten mid-session, a stale-keyed
memo would silently serve codebooks trained on the old bytes — wrong
answers with no error.  These tests pin the fingerprint semantics and
prove a rewrite retrains.
"""

from __future__ import annotations

import os
import shutil

import pytest

from sleep_edf_data_pipeline_spark.queries import quantization_queries as qq

SF_DIR = "/root/testdata/sf0.001"


def _staged_corpus(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir(parents=True)
    shutil.copy(os.path.join(SF_DIR, "embeddings.parquet"),
                d / "embeddings.parquet")
    # queries under test only touch embeddings; documents kept absent
    return str(d)


def test_corpus_key_changes_on_rewrite(tmp_path):
    sf = _staged_corpus(tmp_path)
    k1 = qq._corpus_key(sf)
    assert k1[1], "fingerprint saw no data files"
    # same bytes, untouched → same key
    assert qq._corpus_key(sf) == k1
    # rewrite (size identical, mtime bumped) → new key
    p = os.path.join(sf, "embeddings.parquet")
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert qq._corpus_key(sf) != k1


def test_corpus_key_distinguishes_paths(tmp_path):
    a = _staged_corpus(tmp_path / "a")
    b = _staged_corpus(tmp_path / "b")
    assert qq._corpus_key(a) != qq._corpus_key(b)


def test_rewrite_invalidates_memo_and_retrains(tmp_path, spark, monkeypatch):
    """A rewritten corpus must retrain; an untouched one must reuse."""
    sf = _staged_corpus(tmp_path)
    calls = []
    real_train = qq.train_pq_codebooks

    def counting_train(*args, **kwargs):
        calls.append(1)
        return real_train(*args, **kwargs)

    monkeypatch.setattr(qq, "train_pq_codebooks", counting_train)
    qq.clear_training_cache()
    try:
        qq._train_and_encode(spark, sf)
        assert len(calls) == 1
        qq._train_and_encode(spark, sf)  # untouched → memo hit
        assert len(calls) == 1
        p = os.path.join(sf, "embeddings.parquet")
        st = os.stat(p)
        os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        qq._train_and_encode(spark, sf)  # rewritten → retrain
        assert len(calls) == 2
    finally:
        qq.clear_training_cache()


def test_clear_training_cache_empties_all_memos():
    qq._PQ_BOOKS[("x",)] = "sentinel"
    qq._COARSE[("x",)] = "sentinel"
    qq._PQ_RES_BOOKS[("x",)] = "sentinel"
    qq.clear_training_cache()
    assert not qq._PQ_BOOKS and not qq._COARSE and not qq._PQ_RES_BOOKS
