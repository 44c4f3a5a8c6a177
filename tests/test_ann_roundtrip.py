"""IVF-PQ codebook train → persist → apply roundtrip: the committed
index model must drive encode+search to value-identical output, and
the artifact must be the complete, bounded model."""

from sleep_edf_data_pipeline_spark.queries.ann_roundtrip import (
    _model_path,
    q_ivfpq_roundtrip_topk,
)
from sleep_edf_data_pipeline_spark.queries.quantization_queries import (
    IVF_K,
    PQ_K,
    PQ_M,
    q_ivfpq_topk,
)
from sleep_edf_data_pipeline_spark.writers.versioned import (
    current_version,
    read_versioned,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ivfpq_roundtrip_is_value_identical(spark, sf_dir):
    mono = _rows(q_ivfpq_topk(spark, sf_dir))
    spark.catalog.clearCache()
    rt = _rows(q_ivfpq_roundtrip_topk(spark, sf_dir))
    spark.catalog.clearCache()
    assert rt == mono and len(rt) > 0


def test_ivfpq_artifact_is_the_complete_model(spark, sf_dir):
    path = _model_path(sf_dir)
    v = current_version(path)  # committed by the test above
    assert v is not None
    rows = read_versioned(spark, path, v).collect()
    coarse = [r for r in rows if r["component"] == "coarse"]
    book = [r for r in rows if r["component"] == "book"]
    assert len(coarse) == IVF_K
    assert len(book) == PQ_M * PQ_K
    assert {(r["cell"], r["code"]) for r in book} == {
        (j, c) for j in range(PQ_M) for c in range(PQ_K)
    }
    assert all(len(r["vector"]) in (64, 16) for r in rows)
