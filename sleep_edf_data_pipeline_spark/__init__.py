"""sleep_edf_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference sleep-EDF ELT pipeline
(blaiseclarke/sleep-edf-data-pipeline): schema-enforced ingest, windowed
time-series analytics (moving averages, lag/transition detection,
gaps-and-islands episode detection), grouped conditional aggregation,
per-group normalization, data-quality gating, and quarantine/error
observability — plus the large-scale training-data operators a 100 TB
pipeline needs (dedup, similarity search, text analysis, multimodal
columns).

Everything is expressed DataFrame-first so Catalyst/AQE own the physical
plan; Python only runs inside Arrow-batched pandas UDFs where built-ins
cannot express the semantics (e.g. the EDF spectral extractor).
"""

__version__ = "0.1.0"
