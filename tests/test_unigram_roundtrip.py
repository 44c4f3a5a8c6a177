"""Train → persist → apply roundtrip for the unigram-LM tokenizer
(VERDICT r11 item 6): the persisted artifact must drive the encode
stage to value-identical output, and repeated trainings must stack as
versions on one table (reproducible apply via time travel)."""

from sleep_edf_data_pipeline_spark.queries.unigram_lm import (
    q_unigram_lm_encode_stats,
)
from sleep_edf_data_pipeline_spark.queries.unigram_lm_roundtrip import (
    _model_path,
    q_unigram_lm_roundtrip_stats,
)
from sleep_edf_data_pipeline_spark.writers.versioned import (
    current_version,
    read_versioned,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_roundtrip_is_value_identical_to_monolithic(spark, sf_dir):
    mono = _rows(q_unigram_lm_encode_stats(spark, sf_dir))
    spark.catalog.clearCache()
    rt = _rows(q_unigram_lm_roundtrip_stats(spark, sf_dir))
    spark.catalog.clearCache()
    assert rt == mono


def test_repeated_trainings_stack_versions(spark, sf_dir):
    path = _model_path(sf_dir)
    v_before = current_version(path)  # may exist from the test above
    q_unigram_lm_roundtrip_stats(spark, sf_dir).collect()
    spark.catalog.clearCache()
    v1 = current_version(path)
    q_unigram_lm_roundtrip_stats(spark, sf_dir).collect()
    spark.catalog.clearCache()
    v2 = current_version(path)
    assert v2 == v1 + 1
    if v_before is not None:
        assert v1 == v_before + 1
    # identical corpus → identical model at both versions (time travel
    # returns the pinned snapshot, not the latest)
    m1 = _rows(read_versioned(spark, path, v1).select("piece", "count", "prob"))
    m2 = _rows(read_versioned(spark, path, v2).select("piece", "count", "prob"))
    assert m1 == m2 and len(m1) > 20
