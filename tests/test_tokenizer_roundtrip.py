"""BPE + WordPiece train → persist → apply roundtrips: the persisted
artifact must drive the encode stage to value-identical output (the
unigram twin lives in tests/test_unigram_roundtrip.py)."""

from sleep_edf_data_pipeline_spark.queries.tokenizer_apply import (
    q_bpe_encode_stats,
)
from sleep_edf_data_pipeline_spark.queries.tokenizer_roundtrip import (
    _model_path,
    q_bpe_roundtrip_stats,
    q_wordpiece_roundtrip_stats,
)
from sleep_edf_data_pipeline_spark.queries.wordpiece import (
    q_wordpiece_encode_stats,
)
from sleep_edf_data_pipeline_spark.writers.versioned import (
    current_version,
    read_versioned,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bpe_roundtrip_is_value_identical(spark, sf_dir):
    mono = _rows(q_bpe_encode_stats(spark, sf_dir))
    spark.catalog.clearCache()
    rt = _rows(q_bpe_roundtrip_stats(spark, sf_dir))
    spark.catalog.clearCache()
    assert rt == mono


def test_wordpiece_roundtrip_is_value_identical(spark, sf_dir):
    mono = _rows(q_wordpiece_encode_stats(spark, sf_dir))
    spark.catalog.clearCache()
    rt = _rows(q_wordpiece_roundtrip_stats(spark, sf_dir))
    spark.catalog.clearCache()
    assert rt == mono


def test_bpe_artifact_is_the_inspectable_merge_table(spark, sf_dir):
    path = _model_path(sf_dir, "bpe")
    v = current_version(path)  # committed by the test above
    assert v is not None
    rows = read_versioned(spark, path, v).collect()
    assert 0 < len(rows) <= 64  # BPE_TOP-bounded
    assert all(r["pair_len"] == len(r["pair"]) == 2 for r in rows)
