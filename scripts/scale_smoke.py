"""Scale smoke: replicate sf0.1 ~10× (≈ SF 1) and measure query scaling.

The correctness gates run at sf0.01; this script answers the next
question — *does each plan's wall-clock scale ~linearly with the fact
data* — by synthesizing a 10× corpus with realistic structure and
timing the headline plans at both scales.

Corpus construction (/tmp/scale10, written once):

- ``lineitem``/``orders``/``events``: 10 copies with order/event/user
  keys offset per copy (key uniqueness preserved); dimension keys
  (part/supp/cust/nation) intentionally UNCHANGED — dims stay fixed
  while fact density per dim key grows 10×, which is how real facts
  grow.
- ``documents``: 10 copies with doc_id offset and every NON-stopword
  token given a letters-only per-copy suffix — within-copy
  duplicate/near-dup structure is preserved exactly; cross-copy
  Jaccard is only the tiny shared-stopword overlap (~0.1, far below
  every dedup threshold) so dedup output still scales linearly; and
  the language-model features (alpha-ratio, stopword-ratio) keep
  their distribution, so quality stages see realistic text.  (The
  100x dedup-only corpus keeps the stricter full-suffix scheme —
  exactly-zero cross-copy similarity — since nothing there scores
  language features.)
- ``embeddings``: 10 copies, vec_id offset, one dimension nudged by a
  copy-specific epsilon (keeps vectors distinct; labels unchanged).
- Small dims (region nation customer supplier part) copied as-is.

Usage: python scripts/scale_smoke.py [--regen] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sleep_edf_data_pipeline_spark import registry
from sleep_edf_data_pipeline_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/scale10"
COPIES = 10

#: Queries worth scaling-testing: the fact-heavy headline plans.
SMOKE = [
    "staging_cast",
    "sleep_summary",
    "session_window_agg",
    "product_profit",
    "volume_shipping",
    "minhash_lsh_neardups",
    "simhash_neardups",
    "ngram_jaccard_neardups",
    "document_chunks",
    "bigram_counts",
    "cosine_topk_bruteforce",
    "pagerank_copurchase",
    "exact_moments_suite",
    # r03: explode-heavy corpus ops whose gram fan-out scales with the
    # document table — the ones a 100 TB corpus build actually runs.
    "decontaminate_overlap",
    "repetition_stats",
    "duplicate_spans",
    # r03 session 2: the selection layer (bloom probe, hashed-feature
    # LLR, unigram surprisal) and the compression layer (PQ train +
    # encode over 10x the embedding corpus).
    "bloom_decontaminate",
    "dsir_importance_weights",
    "unigram_logprob_scores",
    "pq_codes",
    "kcore_membership",
    # r04: the two multi-stage pipelines flagged "weak by the 2x rule"
    # at sf0.1 — the fixed-cost hypothesis says their DuckDB ratio
    # falls at 10x; this run is the evidence.  Plus the triangle
    # closure, whose broadcast guard needs a bigger-graph datapoint.
    "ivfpq_topk",
    "triangle_counts",
    # r04 debuts: the new time-series/retrieval/selection families.
    "ewma_user_value",
    "last_touch_attribution",
    "ohlc_bars",
    "twap_user_value",
    "bm25_topk",
    "quality_decile_select",
    # r05: the late r04 debuts that had no decade row (VERDICT item 6)
    # plus the rewritten skew diagnostic and the MAD pair.
    "rolling_median_value",
    "source_overlap_matrix",
    "cohort_ltv",
    "key_skew_report",
    "mad_outliers",
    "mad_outliers_approx",
    # r05 debut (decade row lands with the round-6 smoke run)
    "heavy_hitters_exact",
    # r06: the CMS twin (sketch + bounded candidates — the whole point
    # is that its wall should be ~one corpus pass at any scale), the
    # WAV codec pipeline, the image codec pipeline (two-round bench
    # creep, VERDICT r5 item 4 wants its cost curve), and the
    # exact/bloom auto-switch default.
    "heavy_hitters_cms",
    # r10 debut: DDSketch quantiles — one map-side-combinable groupBy
    # corpus pass into a domain-bounded bucket histogram
    "ddsketch_quantiles_price",
    # r10 debut: k-center coreset — k-1 argmax passes; wall is round
    # overhead at local scale, corpus passes at real scale
    "kcenter_coreset",
    # r10 debut: dedup cascade — four composed decade-flat stages
    "dedup_cascade_verdict",
    # r10 debut: winsorized stats — psi_drift's decomposed-cumulative
    # shape at the (grp, cents) grain
    "winsorized_price_stats",
    # r10 debut: percentile-rank transform — same shape, value-grain out
    "quantile_rank_transform",
    # r10 debut pair: HLL day-sketch rollup + exact first-seen twin
    "hll_rollup_distinct",
    "cum_distinct_users",
    "hll_rolling_wau",
    # r10 debut: vocab coverage curve — count-of-counts fold
    "vocab_coverage_curve",
    # r10 debut: forward as-of conversion join — one user shuffle
    "asof_next_conversion",
    # r11 debuts: the unigram-LM trainer (per-distinct-word Viterbi
    # folds; the vocab collects are scale-free, so the wall should
    # track the word-frequency pass ~linearly) and the KN-smoothed
    # bigram scorer (one gram pass + type-table joins — the
    # bigram_lm_surprisal shape with two extra type aggregations)
    "unigram_lm_vocab",
    "unigram_lm_encode_stats",
    "kn_bigram_surprisal",
    # r11 debut: LSH recall contract — pair-output-bound (its truth
    # side is the lossless prefix-filter join; expect the
    # ngram_jaccard-style ~pair-density scaling, not corpus-linear)
    "lsh_neardup_recall",
    "audio_features",
    "multimodal_features",
    "decontaminate_auto",
    # r06 debuts: each arrives with its decade row
    "bpe_merge_pairs",
    # r07 debut: the BPE APPLY half — encode fold over the per-source
    # vocabulary; wall should track the vocabulary, not the corpus
    "bpe_encode_stats",
    # r07 debut: embedding drift — one posexplode pass reduced to the
    # labels×dims grid; wall should track the vector corpus linearly
    "embedding_drift_by_label",
    # r07 debut: the skew-safe sessionization twin
    "session_window_agg_bucketed",
    # r07 debut: sweep-line occupancy — the calendar-decomposed global
    # prefix; wall should track the session count linearly
    "peak_concurrent_sessions",
    # r07 debut: symspell edit-distance join — variant explode is
    # linear in vocabulary bytes; dims are fixed in the decade corpus,
    # so the wall should be decade-flat
    "fuzzy_name_dedup_symspell",
    # r07 debut: vocabulary growth — one gram pass to first-seen
    "vocab_growth_curve",
    # r08 debut: URL canonical dedup — map + hash-groupBy, the exact
    # content-dedup shuffle shape; wall should track the corpus scan
    "url_canonical_dedup",
    # r08 debut: value-level BPE encode sample — training vocabulary
    # pass scales with the corpus, the sample fold is fixed at 100 docs
    "bpe_encode_sample",
    # r08 debut: CDC duplicate spans — one chunking pass + doc_id
    # self-join + chunk-hash groupBy; within-copy dup structure is
    # preserved by the decade corpus, so output and wall scale ~linear
    "cdc_dedup_spans",
    # r08 debut: host audit — one host shuffle + a 1-row broadcast
    "host_dedup_profile",
    # r09 debut: line dedup — exact-dedup shuffle shape at the line
    # grain; duplicate-line density is corpus-preserved, wall ~linear
    "line_dedup_stats",
    # r10 debut: intra-doc dedup — same segmentation pass, no survivor
    # window at all (within-doc first occurrence always survives)
    "intra_doc_dedup",
    # r09 debut: semantic decontamination — broadcast eval side is
    # fixed-size, train side one scan; wall should track the corpus
    "decontaminate_semantic",
    # r09 debut: RRF fusion — two TakeOrdered corpus passes + a
    # 20x20 rank-join; wall tracks the BM25/cosine scans
    "rrf_fusion",
    # r09 debut: silhouette — one O(N*k) distance pass + tiny groupBy
    "kmeans_silhouette",
    # r09 debut: composed verdict — three corpus passes (projection,
    # hash window, line pass) + doc-grain joins; wall ~linear
    "corpus_keep_verdict",
    # r09 debut: SQ8 search — stats agg + codes scan + bounded refine;
    # wall should track the vector corpus linearly
    "sq_topk_rescore",
    # r09 debut: SQ recall eval — adds the exact broadcast scan
    "sq_recall_eval",
    # r09 debut: readability — one projection pass + tiny groupBy;
    # wall should track corpus bytes exactly
    "readability_scores",
    # r09 debut: trigram novelty — line-dedup shuffle shape at the
    # trigram grain; wall ~linear in corpus tokens
    "ngram_novelty",
    # r09 debut: WordPiece encode — gram-count train pass + per-word
    # fold apply pass; wall ~linear in corpus characters
    "wordpiece_encode_stats",
    # r09 debut: per-edge similarity — adjacency-intersection probe
    # streams per edge; wall ~linear in edges × degree
    "edge_similarity_scores",
    # r09 debut: Morton layout stats — two scans' worth of buckets off
    # ONE orders pass; wall ~linear in facts
    "zorder_layout_stats",
    # r09 debut: Pareto frontier — per-price reduce + decomposed
    # prefix max; wall ~linear in facts
    "pareto_frontier",
    # r09 debut: chi2 drift — one bucket pass + grid-sized tails
    "chi2_drift_by_source",
    # r09 debut: priority sampling — scan + TakeOrdered(k+1) + exact
    # total; wall ~linear in facts, sample fold constant
    "priority_sample_estimate",
    "bigram_lm_surprisal",
    "hard_negatives",
    "cdc_chunks",
    "token_entropy_by_source",
    "hard_negatives_lsh",
    # r06 session-2 debuts
    "label_propagation_communities",
    "incremental_customer_summary",
    "temperature_mixture_weights",
    "normalize_text_nfc",
    "community_quality",
    "psi_drift_by_source",
    "ks_two_sample",
    "image_dhash_neardups",
    # r06 session-3 debut
    "top_event_paths",
    "pmi_cooccurrence",
    # r06 session-4 debuts: OLS moments (fact join + map-side fold),
    # the single-walk ACF, and the two staged-format roundtrips whose
    # wall is dominated by the write — expect ~linear in fact bytes.
    "revenue_trend_ols",
    "acf_user_value",
    "orc_roundtrip_agg",
    "csv_roundtrip_agg",
    # r11: the JSONL roundtrip — write-bound like its siblings
    "json_roundtrip_agg",
    # r12 debuts: the sampled recall audit's decade row must stay FLAT
    # (that is its whole contract — fixed-size truth universe) where
    # lsh_neardup_recall records ~10x; the roundtrips should track
    # their monolithic twins (artifact I/O is vocab/model-sized).
    "lsh_neardup_recall_sampled",
    "unigram_lm_roundtrip_stats",
    "bpe_roundtrip_stats",
    "wordpiece_roundtrip_stats",
    "ivfpq_roundtrip_topk",
    "jl_distortion_audit",
    "ivfpq_probe_recall_curve",
    # r12 debuts (late): winnowing — one posexplode + two doc-window
    # passes, so wall ~linear in corpus tokens; neardups adds the
    # fp_hash shuffle whose buckets MAXDF caps, so pair output (and
    # wall) tracks within-copy duplicate density, which the decade
    # corpus preserves — expect ~linear, never quadratic.  Snake
    # packing is a scan + per-stratum windows + an 8-row reduce.
    "winnowing_fingerprints",
    "winnowing_neardups",
    # same pass as the per-doc form + one source-grain agg — decade row
    # should match winnowing_fingerprints'
    "winnowing_source_stats",
    "shard_snake_packing",
    # r06 session-4: the leakage audit rides the LSH pass — its decade
    # row should track minhash_lsh_neardups' (pair-output-bound).
    "cross_split_leakage",
    # r06 session-4: inverted index — one tokenize pass + one term
    # shuffle; posting truncation is pre-collect, state ≤8 per term.
    "inverted_index_postings",
    # r06 session-4: BFS — per-round frontier⋈edges shuffle over the
    # persisted edge list; expect the kcore/LPA fixed-round profile.
    "bfs_distances",
    # r06 session-4: SCD2 — one customer shuffle, window-chain reuse.
    "scd2_customer_priority",
    # r06 session-4: negative sampling — candidates are nodes×64
    # (linear in nodes), one anti-join shuffle against the edge list.
    "link_negative_sampling",
    # r06 session-4: calibration — two doc projections, one
    # co-partition join, band rollup to ~10 rows.
    "classifier_calibration",
    # r06 session-4: CUSUM — one event_type window chain (shared
    # exchange), argmax row_number; linear in events per type.
    "cusum_changepoint",
    # r07: the PQ search trio — the round-6 verdict's one `weak` item
    # was precisely that these were "scale-safe by reading" with no
    # decade measurement (ivfpq_topk has one; these three did not).
    # Expected shape: training collects are scale-free, the ADC tables
    # broadcast per (query, cell), the corpus side is one coded-probe
    # join — wall should track the embedding-corpus decade ~linearly.
    "pq_topk_adc",
    "pq_topk_refined",
    "ivfpq_residual_topk",
]


def _copy_union(spark, name: str, remap) -> None:
    base = spark.read.parquet(f"{BASE}/{name}.parquet")
    parts = [remap(base, i) for i in range(COPIES)]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{SCALED}/{name}.parquet")


def generate(spark) -> None:
    os.makedirs(SCALED, exist_ok=True)
    for name in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{BASE}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SCALED}/{name}.parquet")

    okey = 10_000_000
    _copy_union(
        spark,
        "orders",
        lambda df, i: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * okey)
        ),
    )
    _copy_union(
        spark,
        "lineitem",
        lambda df, i: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * okey)
        ),
    )
    _copy_union(
        spark,
        "events",
        lambda df, i: df.withColumn(
            "event_id", F.col("event_id") + F.lit(i * okey)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000)),
    )

    def remap_docs(df, i):
        from sleep_edf_data_pipeline_spark.operators.text import LANG_MARKERS

        toks = F.split(F.col("text"), " ")
        suffix = chr(97 + i // 26) + chr(97 + i % 26)  # letters only
        newtext = F.concat_ws(
            " ",
            F.transform(
                toks,
                lambda t: F.when(
                    t.isin(*LANG_MARKERS["en"]), t
                ).otherwise(F.concat(t, F.lit(suffix))),
            ),
        )
        return (
            df.withColumn("doc_id", F.col("doc_id") + F.lit(i * okey))
            .withColumn("text", newtext)
            .withColumn("n_chars", F.length(F.col("text")))
        )

    _copy_union(spark, "documents", remap_docs)

    def remap_emb(df, i):
        eps = F.lit(float(i) * 1e-3)
        return df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * okey)
        ).withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda v, j: F.when(j == 0, v + eps).otherwise(v).cast("float"),
            ),
        )

    _copy_union(spark, "embeddings", remap_emb)


SCALED100 = "/tmp/scale100"

#: The dedup family gets a second decade (~500k docs ≈ SF 1 for the
#: documents table): candidate generation is the part of these plans
#: that could go quadratic, so it gets the deepest scaling evidence.
DEDUP100 = [
    "minhash_lsh_neardups",
    "simhash_neardups",
    "ngram_jaccard_neardups",
    # r11 (verdict item 3): the composed cascade was the one r10 debut
    # whose 100x behavior was inherited from its stages rather than
    # measured (the round-10 attempt hit a co-tenant load spike); the
    # cascade reads only documents, so the dedup100 corpus fits it.
    "dedup_cascade_verdict",
    # r12: the sampled recall audit's whole contract is flatness at
    # 100x duplicate-pair density (where minhash_lsh_neardups records
    # 438 s); measured 2.38 -> 2.46 s manually in round 12, kept here
    # so the row is reproducible.
    "lsh_neardup_recall_sampled",
    # r12 (late): winnowing near-dups — worst axis is duplicate-pair
    # density; MAXDF caps every fingerprint bucket at 64 docs, so the
    # pair output (and wall) must stay bounded even when the corpus is
    # 100 near-identical copies of itself.
    "winnowing_neardups",
]

#: Selection-layer queries for the 100x decade (documents-only corpus):
#: the ops whose broadcast/bitset sides grow with the benchmark suite.
SELECT100 = [
    "bloom_decontaminate",
    "decontaminate_overlap",
    "dsir_importance_weights",
    "unigram_logprob_scores",
    # r06 gram-heavy debuts: second decade for the LM-scoring pair
    "bigram_lm_surprisal",
    "cdc_chunks",
    # r07: second decade for the BPE APPLY pass — the encode fold runs
    # over the vocabulary, so its wall should stay sublinear even as
    # the doc corpus grows 100x
    "bpe_encode_stats",
    # r08 (verdict item 4): second decade for embedding drift — the
    # corpus pass reduces to a |labels|x|dims| grid, so the wall should
    # track the scan, never the grid tail
    "embedding_drift_by_label",
    # r08: the value-level encode sample rides the same vocabulary
    # training pass as bpe_encode_stats; sample side is bounded
    "bpe_encode_sample",
    # r09 (verdict item 2): second decade for the CDC span dedup — the
    # only r8 debut with a join in the hot path (chunk spans ⋈ token
    # arrays, co-partitioned on doc_id); both sides scale with the
    # corpus, so the wall should stay ~linear, never super-linear
    "cdc_dedup_spans",
    # r09 debuts, second decade: line dedup is one corpus pass + two
    # reduced shuffles (claim: ~linear); semantic decontamination's
    # eval side grows with the synthetic split, so its wall tracks the
    # blocked join's candidate count
    "line_dedup_stats",
    "decontaminate_semantic",
    # r09 late debuts, second decade: trigram novelty is the batch's
    # highest 10x factor (5.2x — the hash window grows with distinct
    # trigrams), so the 100x row proves it stays ~linear; wordpiece's
    # fold cost is per-character, claim decade-flat-to-linear
    "ngram_novelty",
    "wordpiece_encode_stats",
    # r11 debuts, second decade: the unigram-LM trainer's Viterbi
    # passes run over DISTINCT words (sublinear in occurrences — the
    # 100x corpus suffixes vocabularies per copy, so distinct words
    # grow ~100x: this is the stress axis for the fold + vocab train);
    # KN rides the same gram-histogram shape as bigram_lm_surprisal
    "unigram_lm_vocab",
    "kn_bigram_surprisal",
]


def generate_docs100(spark) -> None:
    """100 copies of sf0.1 documents, same suffix scheme as generate().

    Cross-copy token vocabularies are disjoint, so every near-dup pair
    is within-copy and the TRUE pair count scales exactly linearly —
    any super-linear wall growth is the algorithm's fault, not the
    data's.
    """
    os.makedirs(SCALED100, exist_ok=True)
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    okey = 10_000_000
    parts = []
    for i in range(100):
        toks = F.split(F.col("text"), " ")
        suffix = chr(97 + i // 26) + chr(97 + i % 26)  # letters only
        newtext = F.concat_ws(
            " ", F.transform(toks, lambda t: F.concat(t, F.lit(suffix)))
        )
        parts.append(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * okey))
            .withColumn("text", newtext)
            .withColumn("n_chars", F.length(F.col("text")))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{SCALED100}/documents.parquet"
    )


def generate_emb100(spark) -> None:
    """100 copies of sf0.1 embeddings (same remap scheme as the 10x
    corpus: vec_id offset + a per-copy dim-0 epsilon so copies are not
    bit-identical vectors).  Labels are preserved, so every per-label
    centroid accumulates 100x the vectors — the drift grid's row count
    stays |labels|x|dims| while the corpus pass grows 100x."""
    base = spark.read.parquet(f"{BASE}/embeddings.parquet")
    okey = 10_000_000
    parts = []
    for i in range(100):
        eps = F.lit(float(i) * 1e-3)
        parts.append(
            base.withColumn("vec_id", F.col("vec_id") + F.lit(i * okey))
            .withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda v, j: F.when(j == 0, v + eps)
                    .otherwise(v)
                    .cast("float"),
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{SCALED100}/embeddings.parquet"
    )


def dedup100(spark, out_path: str) -> None:
    if not os.path.isdir(f"{SCALED}/documents.parquet"):
        generate(spark)
    if "--regen" in sys.argv or not os.path.isdir(f"{SCALED100}/documents.parquet"):
        t0 = time.perf_counter()
        generate_docs100(spark)
        print(
            f"# generated {SCALED100} in {time.perf_counter() - t0:.0f}s",
            file=sys.stderr,
        )
    queries, _ = registry.collect()
    names = list(DEDUP100)
    prior = {}
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        keep = set(sys.argv[i + 1].split(","))
        unknown = keep - set(names)
        if unknown:
            sys.exit(
                f"scale_smoke.py: --only names not in DEDUP100: {sorted(unknown)}"
            )
        names = [n for n in names if n in keep]
        if os.path.exists(out_path):
            with open(out_path) as f:
                prior = {
                    k: v
                    for k, v in json.load(f).get("queries", {}).items()
                    if k in DEDUP100
                }
    results = dict(prior)
    for name in names:
        fn = queries[name]
        t = {}
        for label, d, reps in (
            ("sf0.1", BASE, 2),
            ("scale10", SCALED, 2),
            ("scale100", SCALED100, 1),
        ):
            best, rows = float("inf"), 0
            for _ in range(reps):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            t[label] = round(best, 3)
            t[f"{label}_rows"] = rows
            spark.catalog.clearCache()
        t["x10"] = round(t["scale10"] / t["sf0.1"], 2)
        t["x100"] = round(t["scale100"] / t["sf0.1"], 2)
        results[name] = t
        print(f"# {name}: {t}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump({"base": BASE, "queries": results}, f, indent=1)
        f.write("\n")
    print(json.dumps(results))


def select100(spark, out_path: str) -> None:
    """100x decade for the selection layer (reuses the dedup100 corpus)."""
    if not os.path.isdir(f"{SCALED}/documents.parquet"):
        generate(spark)
    if not os.path.isdir(f"{SCALED100}/documents.parquet"):
        generate_docs100(spark)
    if not os.path.isdir(f"{SCALED100}/embeddings.parquet"):
        generate_emb100(spark)
    queries, _ = registry.collect()
    names = list(SELECT100)
    prior = {}
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        keep = set(sys.argv[i + 1].split(","))
        unknown = keep - set(names)
        if unknown:
            sys.exit(f"scale_smoke.py: --only names not in SELECT100: {sorted(unknown)}")
        names = [n for n in names if n in keep]
        if os.path.exists(out_path):
            with open(out_path) as f:
                prior = {
                    k: v
                    for k, v in json.load(f).get("queries", {}).items()
                    if k in SELECT100
                }
    results = dict(prior)
    for name in names:
        fn = queries[name]
        t = {}
        for label, d, reps in (
            ("sf0.1", BASE, 2),
            ("scale10", SCALED, 2),
            ("scale100", SCALED100, 1),
        ):
            best, rows = float("inf"), 0
            for _ in range(reps):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            t[label] = round(best, 3)
            t[f"{label}_rows"] = rows
            spark.catalog.clearCache()
        t["x10"] = round(t["scale10"] / t["sf0.1"], 2)
        t["x100"] = round(t["scale100"] / t["sf0.1"], 2)
        results[name] = t
        print(f"# {name}: {t}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(
            {"base": BASE, "queries": results}, f, indent=1
        )
        f.write("\n")


EVENTS100 = "/tmp/events100_skew"

#: Hot keys injected into the skewed 100x events corpus.
N_HOT_KEYS = 10
#: 1-in-HOT_MOD events remapped to a hot key (~5% of the stream).
HOT_MOD = 20


def generate_events100_skew(spark) -> None:
    """100x events with INJECTED Zipf-like head: ~5% of all events
    remapped onto 10 global hot keys.

    The base synthetic events table is near-uniform over user_id, which
    (documented in SCALING.md) means it has NO heavy hitters by the CMS
    eps definition at 10x — the sketch correctly answers "none", but
    that is only the negative half of the evidence.  This corpus is the
    positive half: hot keys whose counts (~70k each at 13.5M events)
    sit two orders of magnitude above the sketch noise floor
    (eps·N ≈ 1.4k), the regime the CMS path exists for.  Remap is
    deterministic (event_id % HOT_MOD), so the exact twin defines the
    ground truth.
    """
    os.makedirs(EVENTS100, exist_ok=True)
    base = spark.read.parquet(f"{BASE}/events.parquet")
    okey = 10_000_000
    parts = []
    for i in range(100):
        parts.append(
            base.withColumn("event_id", F.col("event_id") + F.lit(i * okey))
            .withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
        )
    out = parts[0]
    for piece in parts[1:]:
        out = out.unionByName(piece)
    # hot key from the QUOTIENT (the remainder is constant 0 on the
    # selected rows); negative ids keep hot keys disjoint from every
    # organic user_id
    skewed = out.withColumn(
        "user_id",
        F.when(
            F.col("event_id") % HOT_MOD == 0,
            -1 - (F.floor(F.col("event_id") / HOT_MOD) % N_HOT_KEYS),
        ).otherwise(F.col("user_id")),
    )
    skewed.repartition(64).write.mode("overwrite").parquet(
        f"{EVENTS100}/events.parquet"
    )
    generate_orders100_skew(spark)


def generate_orders100_skew(spark) -> None:
    """100x orders with fixed customer dimension + injected whale
    customers — the SCD2/per-customer-window skew mode.

    Facts grow 100x while o_custkey stays UNCHANGED (the scale10
    construction pushed one decade further), and 1-in-HOT_MOD orders
    are remapped onto N_HOT_KEYS negative "whale" custkeys (~75k
    orders each at 15M rows): a per-customer ordered window must walk
    one whale's whole history in one task — the same sequential-walk
    stress the events hot keys put on user_id windows.
    """
    base = spark.read.parquet(f"{BASE}/orders.parquet")
    okey = 100_000_000
    parts = [
        base.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * okey))
        for i in range(100)
    ]
    out = parts[0]
    for piece in parts[1:]:
        out = out.unionByName(piece)
    skewed = out.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % HOT_MOD == 0,
            -1 - (F.floor(F.col("o_orderkey") / HOT_MOD) % N_HOT_KEYS),
        ).otherwise(F.col("o_custkey")),
    )
    skewed.repartition(64).write.mode("overwrite").parquet(
        f"{EVENTS100}/orders.parquet"
    )


EDGES10 = "/tmp/scale_edges10"


def generate_edges10(spark) -> None:
    """10 copies of sf0.1 lineitem with BOTH ``l_orderkey`` and
    ``l_partkey`` offset per copy: the PART dimension (co-purchase
    graph nodes) and the edge set grow 10× while per-order basket size
    — hence per-node degree and adjacency-array length — stay
    copy-invariant.  This is the adjacency-growth axis the fixed-dim
    decade corpus holds constant by construction (VERDICT r9 item 7).
    """
    os.makedirs(EDGES10, exist_ok=True)
    base = spark.read.parquet(f"{BASE}/lineitem.parquet")
    okey = 100_000_000
    pkey = 10_000_000
    parts = []
    for i in range(10):
        parts.append(
            base.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * okey))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * pkey))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(64).write.mode("overwrite").parquet(
        f"{EDGES10}/lineitem.parquet"
    )


def edges10(spark, out_path: str) -> None:
    """Parts-scaled decade for ``edge_similarity_scores``: walls at
    both scales in BOTH join modes (packed-adjacency broadcast and the
    above-threshold shuffled path, forced by zeroing the threshold) +
    a distributed checksum equality between the modes — the
    broadcast→shuffle flip exercised and verified, never silently
    trusted."""
    from sleep_edf_data_pipeline_spark.queries import link_prediction
    from sleep_edf_data_pipeline_spark.queries.graph_stats import (
        _copurchase_edges,
    )

    if "--regen" in sys.argv or not os.path.isdir(
        f"{EDGES10}/lineitem.parquet"
    ):
        t0 = time.perf_counter()
        generate_edges10(spark)
        print(
            f"# generated {EDGES10} in {time.perf_counter() - t0:.0f}s",
            file=sys.stderr,
        )

    def checksum(df):
        row = df.agg(
            F.count("*").alias("rows"),
            F.sum("cn").alias("s_cn"),
            F.sum("deg_u").alias("s_du"),
            F.sum(F.floor(F.col("resource_alloc") * 1_000_000)).alias("s_ra"),
        ).collect()[0]
        return tuple(row)

    results: dict = {}
    for label, d in (("sf0.1", BASE), ("edges10", EDGES10)):
        n_edges = (
            _copurchase_edges(spark, d)
            .filter(F.col("src") < F.col("dst"))
            .count()
        )
        spark.catalog.clearCache()
        entry: dict = {"undirected_edges": n_edges}
        sums = {}
        orig_cap = link_prediction.TRIANGLE_BROADCAST_MAX_EDGES
        for mode, cap in (("broadcast", orig_cap), ("shuffled", 0)):
            link_prediction.TRIANGLE_BROADCAST_MAX_EDGES = cap
            try:
                best, cs = float("inf"), None
                for _ in range(2):
                    t0 = time.perf_counter()
                    cs = checksum(
                        link_prediction.q_edge_similarity_scores(spark, d)
                    )
                    best = min(best, time.perf_counter() - t0)
                    spark.catalog.clearCache()
                entry[mode] = round(best, 3)
                sums[mode] = cs
            finally:
                link_prediction.TRIANGLE_BROADCAST_MAX_EDGES = orig_cap
        entry["modes_agree"] = sums["broadcast"] == sums["shuffled"]
        entry["rows"] = sums["broadcast"][0]
        results[label] = entry
        print(f"# {label}: {entry}", file=sys.stderr)
    results["x10_broadcast"] = round(
        results["edges10"]["broadcast"] / results["sf0.1"]["broadcast"], 2
    )
    results["x10_shuffled"] = round(
        results["edges10"]["shuffled"] / results["sf0.1"]["shuffled"], 2
    )
    with open(out_path, "w") as f:
        json.dump({"base": BASE, "edge_similarity_scores": results}, f, indent=1)
        f.write("\n")
    print(json.dumps(results))


#: Iterative graph queries for the node-scaled decade (VERDICT r10
#: item 8): the fixed-dim decade corpus holds the part/node set
#: constant, so their prior 10x rows only grew edge MULTIPLICITY.
#: The EDGES10 corpus scales nodes AND edges 10x with per-node degree
#: invariant — exactly the axis that grows per-round frontier/label/
#: degree state.
NODES10 = [
    "pagerank_copurchase",
    "kcore_membership",
    "bfs_distances",
    "label_propagation_communities",
]


def nodes10(spark, out_path: str) -> None:
    """Node-scaled decade for the iterative graph family.

    All four queries read only lineitem, so they run unchanged against
    the EDGES10 corpus (10x parts, 10x edges, copy-invariant degree).
    Expectations: per-round state (ranks / labels / degrees / frontier)
    grows 10x, so ~linear wall growth is the pass bar.  BFS is the one
    asymmetry: the 10 copies are disconnected replicas and BFS explores
    only the hub's copy, so its OUTPUT stays copy-sized while every
    per-round edge relaxation still scans the 10x edge list — rows are
    recorded so the asymmetry is visible, not hidden.
    """
    if "--regen" in sys.argv or not os.path.isdir(
        f"{EDGES10}/lineitem.parquet"
    ):
        t0 = time.perf_counter()
        generate_edges10(spark)
        print(
            f"# generated {EDGES10} in {time.perf_counter() - t0:.0f}s",
            file=sys.stderr,
        )
    queries, _ = registry.collect()
    results = {}
    for name in NODES10:
        fn = queries[name]
        t = {}
        for label, d, reps in (("sf0.1", BASE, 2), ("nodes10", EDGES10, 2)):
            best, rows = float("inf"), 0
            for _ in range(reps):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            t[label] = round(best, 3)
            t[f"{label}_rows"] = rows
            spark.catalog.clearCache()
        t["x10"] = round(t["nodes10"] / t["sf0.1"], 2)
        results[name] = t
        print(f"# {name}: {t}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump({"base": BASE, "corpus": EDGES10, "queries": results}, f, indent=1)
        f.write("\n")
    print(json.dumps(results))


EDGES100 = "/tmp/scale_edges100"

#: The two iterative graph queries whose per-round REWRITE cost is
#: linear in node state — the 100 TB risk VERDICT r11 item 5 asks to
#: pin past the 10x row (kcore measured 2.15x at 10x; one more decade
#: decides "linear in state" vs "superlinear").
NODES100 = [
    "kcore_membership",
    "label_propagation_communities",
]


def generate_edges100(spark) -> None:
    """100 copies of sf0.1 lineitem, orderkey+partkey offset per copy:
    nodes AND edges 100x, per-node degree copy-invariant — the
    ``generate_edges10`` axis, one more decade.  Built from EDGES10
    (10 copies of the 10x corpus) so the union stays 10-wide."""
    if not os.path.isdir(f"{EDGES10}/lineitem.parquet"):
        generate_edges10(spark)
    os.makedirs(EDGES100, exist_ok=True)
    base = spark.read.parquet(f"{EDGES10}/lineitem.parquet")
    okey = 1_000_000_000
    pkey = 100_000_000
    parts = [
        base.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * okey))
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * pkey))
        for i in range(10)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(256).write.mode("overwrite").parquet(
        f"{EDGES100}/lineitem.parquet"
    )


def nodes100(spark, out_path: str) -> None:
    """Node-scaled CENTURY for the per-round-rewrite graph queries.

    Pass bar: wall growth ~linear in node/edge state across BOTH
    decades (sf0.1 -> nodes10 -> nodes100).  nodes100 runs once per
    query (minutes-scale walls; the sf0.1/nodes10 bests use the usual
    best-of-2)."""
    if "--regen" in sys.argv or not os.path.isdir(
        f"{EDGES100}/lineitem.parquet"
    ):
        t0 = time.perf_counter()
        generate_edges100(spark)
        print(
            f"# generated {EDGES100} in {time.perf_counter() - t0:.0f}s",
            file=sys.stderr,
        )
    queries, _ = registry.collect()
    results = {}
    for name in NODES100:
        fn = queries[name]
        t = {}
        for label, d, reps in (
            ("sf0.1", BASE, 2),
            ("nodes10", EDGES10, 2),
            ("nodes100", EDGES100, 1),
        ):
            best, rows = float("inf"), 0
            for _ in range(reps):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            t[label] = round(best, 3)
            t[f"{label}_rows"] = rows
        t["x10"] = round(t["nodes10"] / t["sf0.1"], 2)
        t["x100"] = round(t["nodes100"] / t["sf0.1"], 2)
        t["x100_per_decade"] = round(t["nodes100"] / t["nodes10"], 2)
        results[name] = t
        print(f"# {name}: {t}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(
            {"base": BASE, "corpus": EDGES100, "queries": results}, f, indent=1
        )
        f.write("\n")
    print(json.dumps(results))


def events100(spark, out_path: str) -> None:
    """Skewed second decade for the heavy-hitter pair: wall clocks AND
    sketch-vs-exact recovery on a corpus that HAS heavy hitters."""
    from sleep_edf_data_pipeline_spark.queries.heavy_hitters import (
        q_heavy_hitters_cms,
        q_heavy_hitters_exact,
    )

    if "--regen" in sys.argv or not os.path.isdir(f"{EVENTS100}/events.parquet"):
        t0 = time.perf_counter()
        generate_events100_skew(spark)
        print(
            f"# generated {EVENTS100} in {time.perf_counter() - t0:.0f}s",
            file=sys.stderr,
        )
    results = {}
    rows = {}
    for name, fn in (
        ("heavy_hitters_exact", q_heavy_hitters_exact),
        ("heavy_hitters_cms", q_heavy_hitters_cms),
    ):
        t = {}
        for label, d, reps in (("sf0.1", BASE, 2), ("events100", EVENTS100, 2)):
            best, collected = float("inf"), None
            for _ in range(reps):
                t0 = time.perf_counter()
                collected = fn(spark, d).collect()
                best = min(best, time.perf_counter() - t0)
            t[label] = round(best, 3)
            if label == "events100":
                rows[name] = collected
        t["x100"] = round(t["events100"] / t["sf0.1"], 2)
        results[name] = t
        print(f"# {name}: {t}", file=sys.stderr)
    exact_set = [r["user_id"] for r in rows["heavy_hitters_exact"]]
    cms_set = [r["user_id"] for r in rows["heavy_hitters_cms"]]
    hot = {-1 - k for k in range(N_HOT_KEYS)}
    coverage = {
        "exact_top": exact_set,
        "cms_top": cms_set,
        "hot_keys_in_exact_top10": sorted(hot & set(exact_set[:N_HOT_KEYS])),
        "hot_keys_in_cms_top10": sorted(hot & set(cms_set[:N_HOT_KEYS])),
        "cms_recovers_all_hot_keys": hot <= set(cms_set),
        "max_cms_overestimate": max(
            est - true
            for est, true in zip(
                (r["est_events"] for r in rows["heavy_hitters_cms"]),
                (
                    next(
                        e["n_events"]
                        for e in rows["heavy_hitters_exact"]
                        if e["user_id"] == r["user_id"]
                    )
                    for r in rows["heavy_hitters_cms"]
                    if any(
                        e["user_id"] == r["user_id"]
                        for e in rows["heavy_hitters_exact"]
                    )
                ),
            )
        ),
    }
    print(f"# coverage: {coverage}", file=sys.stderr)

    # The windowed per-key family under the SAME injected skew: each
    # hot key is one window partition (~70k rows in one task at 135×
    # events) — this measures whether the per-key sequential walks
    # survive a Zipf head, the skew mode salting can't fix (the
    # sequence itself is the semantics).  Rows-only walls.
    from sleep_edf_data_pipeline_spark.queries.behavior_analytics import (
        q_top_event_paths,
    )
    from sleep_edf_data_pipeline_spark.queries.drift_stats import (
        q_cusum_changepoint,
    )
    from sleep_edf_data_pipeline_spark.queries.event_windows import (
        q_session_window_agg,
        q_session_window_agg_bucketed,
    )
    from sleep_edf_data_pipeline_spark.queries.occupancy import (
        q_peak_concurrent_sessions,
    )
    from sleep_edf_data_pipeline_spark.queries.relational_breadth import (
        q_scd2_customer_priority,
    )
    from sleep_edf_data_pipeline_spark.queries.timeseries_extra import (
        q_ewma_user_value,
        q_ohlc_bars,
    )
    from sleep_edf_data_pipeline_spark.queries.trend_stats import (
        q_acf_user_value,
    )

    if not os.path.isdir(f"{EVENTS100}/orders.parquet"):
        generate_orders100_skew(spark)

    for name, fn in (
        ("ewma_user_value", q_ewma_user_value),
        ("acf_user_value", q_acf_user_value),
        ("cusum_changepoint", q_cusum_changepoint),
        # r07 (verdict item 5): the rest of the ordered-window family.
        # ohlc_bars partitions on (event_type, hour) — the 100x corpus
        # repeats the SAME time range, so every bar cell holds 100x
        # rows; session_window_agg and top_event_paths partition on
        # user_id and hit the injected ~70k-row hot keys;
        # scd2_customer_priority partitions on o_custkey and hits the
        # whale customers of the 100x orders twin.
        ("ohlc_bars", q_ohlc_bars),
        ("session_window_agg", q_session_window_agg),
        ("session_window_agg_bucketed", q_session_window_agg_bucketed),
        # r07: sweep-line occupancy — the 100x corpus multiplies every
        # (day, hour) delta cell 100x; hot USERS only multiply session
        # counts, so the hour-partitioned walk is the stressed path
        ("peak_concurrent_sessions", q_peak_concurrent_sessions),
        ("top_event_paths", q_top_event_paths),
        ("scd2_customer_priority", q_scd2_customer_priority),
    ):
        t = {}
        for label, d in (("sf0.1", BASE), ("events100", EVENTS100)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            t[label] = round(best, 3)
            spark.catalog.clearCache()
        t["x100"] = round(t["events100"] / t["sf0.1"], 2)
        results[name] = t
        print(f"# {name}: {t}", file=sys.stderr)

    with open(out_path, "w") as f:
        json.dump({"base": BASE, "queries": results, "coverage": coverage}, f, indent=1)
        f.write("\n")


def main() -> None:
    out_path = sys.argv[-1] if sys.argv[-1].endswith(".json") else "SCALE_SMOKE.json"
    spark = get_spark(app_name="scale-smoke")
    if "--edges10" in sys.argv:
        edges10(
            spark,
            out_path
            if sys.argv[-1].endswith(".json")
            else "SCALE_SMOKE_EDGES10.json",
        )
        return
    if "--nodes10" in sys.argv:
        nodes10(
            spark,
            out_path
            if sys.argv[-1].endswith(".json")
            else "SCALE_SMOKE_NODES10.json",
        )
        return
    if "--nodes100" in sys.argv:
        nodes100(
            spark,
            out_path
            if sys.argv[-1].endswith(".json")
            else "SCALE_SMOKE_NODES100.json",
        )
        return
    if "--events100" in sys.argv:
        events100(
            spark,
            out_path
            if sys.argv[-1].endswith(".json")
            else "SCALE_SMOKE_EVENTS100.json",
        )
        return
    if "--select100" in sys.argv:
        select100(
            spark,
            out_path
            if sys.argv[-1].endswith(".json")
            else "SCALE_SMOKE_SELECT100.json",
        )
        return
    if "--dedup100" in sys.argv:
        dedup100(
            spark,
            out_path
            if sys.argv[-1].endswith(".json")
            else "SCALE_SMOKE_100.json",
        )
        return
    if "--regen" in sys.argv or not os.path.isdir(f"{SCALED}/documents.parquet"):
        t0 = time.perf_counter()
        generate(spark)
        print(f"# generated {SCALED} in {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    queries, _ = registry.collect()
    # --only a,b,c: measure just those SMOKE queries and MERGE into the
    # existing artifact (same contract as bench_duckdb --only) — new
    # debuts get their decade row without re-measuring the full list.
    smoke = list(SMOKE)
    prior_results = {}
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        if i + 1 >= len(sys.argv):
            sys.exit("scale_smoke.py: --only requires a comma-separated value")
        keep = set(sys.argv[i + 1].split(","))
        unknown = keep - set(smoke)
        if unknown:
            sys.exit(f"scale_smoke.py: --only names not in SMOKE: {sorted(unknown)}")
        smoke = [n for n in smoke if n in keep]
        if os.path.exists(out_path):
            with open(out_path) as f:
                prior_results = {
                    k: v
                    for k, v in json.load(f).get("queries", {}).items()
                    if k in SMOKE  # drop renamed/retired keys
                }
    results = dict(prior_results)
    for name in smoke:
        fn = queries[name]
        # warm once at base scale, then best-of-2 at each scale
        fn(spark, BASE).count()
        t = {}
        for label, d in (("sf0.1", BASE), ("scale10", SCALED)):
            best, rows = float("inf"), 0
            for _ in range(2):
                t0 = time.perf_counter()
                rows = fn(spark, d).count()
                best = min(best, time.perf_counter() - t0)
            t[label] = round(best, 3)
            t[f"{label}_rows"] = rows
        t["scaling_x"] = round(t["scale10"] / t["sf0.1"], 2) if t["sf0.1"] else None
        results[name] = t
        print(f"# {name}: {t}", file=sys.stderr)
        # drop the per-invocation persist()ed frames (dedup signatures,
        # graph edges) so cached blocks don't accumulate across queries
        spark.catalog.clearCache()

    with open(out_path, "w") as f:
        json.dump(
            {"copies": COPIES, "base": BASE, "scaled": SCALED, "queries": results},
            f,
            indent=1,
        )
        f.write("\n")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
