"""Round-13 optimization pins: each rewrite that changed an operator's
internals gets a focused equivalence test against the form it replaced
(the oracle-parity suite proves values vs DuckDB; these prove the
specific internal equivalences the rewrites rely on)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark.operators.components import (
    label_propagation,
)
from sleep_edf_data_pipeline_spark.operators.multimodal import (
    audio_features_from_text,
    extract_audio_features,
)
from sleep_edf_data_pipeline_spark.queries.quantization_queries import (
    IVF_ITERS,
    IVF_K,
    IVFPQ_SHORTLIST,
    PQ_DIM,
    PQ_ITERS,
    PQ_K,
    PQ_M,
    PQ_QUERIES,
    ivfpq_adc_ranked,
    ivfpq_adc_swept,
    ivfpq_encode,
)
from sleep_edf_data_pipeline_spark.queries.ivf_probe_curve import (
    NPROBE_SWEEP,
)
from sleep_edf_data_pipeline_spark.tables import spread, table


def test_lpa_round1_elision_matches_explicit_identity_join(spark):
    """Round 1 projecting ``b AS label`` must equal the old l0-join form
    — pinned on a graph where argmax ties and multiplicities matter."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (4, 1)], "src int, dst int"
    )
    got = sorted(
        map(tuple, label_propagation(edges, iters=1).collect())
    )
    # old formulation: explicit identity labels joined on b
    pairs = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    l0 = (
        pairs.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    want = sorted(
        map(
            tuple,
            pairs.join(l0.select(F.col("node").alias("b"), "label"), "b")
            .groupBy(F.col("a").alias("node"), "label")
            .agg(F.count("*").alias("c"))
            .groupBy("node")
            .agg(F.max(F.struct("c", (-F.col("label")).alias("nl"))).alias("m"))
            .select("node", (-F.col("m.nl")).alias("label"))
            .collect(),
        )
    )
    assert got == want


def test_lpa_iters_zero_returns_identity_labels(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src int, dst int")
    got = sorted(map(tuple, label_propagation(edges, iters=0).collect()))
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_adc_swept_equals_per_setting_ranked(spark, sf_dir):
    """The one-tagged-scan sweep must reproduce ivfpq_adc_ranked's
    (query_id, neighbor_id, _rn) rows exactly, per setting."""
    from sleep_edf_data_pipeline_spark.operators.clustering import kmeans
    from sleep_edf_data_pipeline_spark.operators.quantization import (
        train_pq_codebooks,
    )

    emb = spread(table(spark, sf_dir, "embeddings"), "vec_id")
    _, coarse = kmeans(emb, k=IVF_K, iters=IVF_ITERS)
    books = train_pq_codebooks(
        emb, dim=PQ_DIM, m=PQ_M, k=PQ_K, iters=PQ_ITERS
    )
    qrows = (
        emb.filter(F.col("vec_id") < PQ_QUERIES)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    qvecs = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows]
    coded = ivfpq_encode(emb, coarse, books).persist()
    coded.count()
    swept = (
        ivfpq_adc_swept(
            spark, coarse, books, coded=coded, qvecs=qvecs,
            sweep=NPROBE_SWEEP, shortlist=IVFPQ_SHORTLIST,
        )
        .collect()
    )
    by_np: dict[int, list[tuple]] = {}
    for r in swept:
        by_np.setdefault(r["nprobe"], []).append(
            (r["query_id"], r["neighbor_id"], r["_rn"])
        )
    for np_ in NPROBE_SWEEP:
        want = sorted(
            (r["query_id"], r["neighbor_id"], r["_rn"])
            for r in ivfpq_adc_ranked(
                spark, emb, coarse, books, nprobe=np_,
                max_rank=IVFPQ_SHORTLIST * np_, coded=coded, qvecs=qvecs,
            ).collect()
        )
        assert sorted(by_np[np_]) == want, f"nprobe={np_}"
    coded.unpersist()


def test_fused_audio_features_equal_two_stage_pipeline(spark):
    pdf = pd.DataFrame(
        {
            "asset_id": ["1", "2", "3"],
            "text": ["ab cd", "zzz", "a"],
        }
    )
    src = spark.createDataFrame(pdf)
    fused = sorted(
        map(tuple, audio_features_from_text(src).collect())
    )

    # the two-stage form it replaced: synth mapInPandas -> featurize
    from sleep_edf_data_pipeline_spark.operators.codecs import encode_wav

    def encode(batches):
        for b in batches:
            payloads = []
            for t in b["text"]:
                s = (
                    np.frombuffer(
                        t.encode("ascii"), dtype=np.uint8
                    ).astype(np.int16)
                    - 96
                ) * 257
                payloads.append(encode_wav(s, 16000))
            yield pd.DataFrame(
                {"asset_id": b["asset_id"], "payload": payloads}
            )

    assets = src.mapInPandas(
        encode, schema="asset_id string, payload binary"
    )
    twostage = sorted(map(tuple, extract_audio_features(assets).collect()))
    assert fused == twostage
