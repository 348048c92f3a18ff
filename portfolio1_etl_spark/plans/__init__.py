"""Query registry: every operator from SURVEY.md §2 lands here as a
``queries()``/``oracle_sql()`` pair. Importing this package populates
the registry."""

from portfolio1_etl_spark.plans.registry import REGISTRY, Query, query

# Register all query modules (import side effects fill REGISTRY).
from portfolio1_etl_spark.plans import relational  # noqa: F401,E402
from portfolio1_etl_spark.plans import reference_pipeline  # noqa: F401,E402
from portfolio1_etl_spark.plans import windows_events  # noqa: F401,E402
from portfolio1_etl_spark.plans import text_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import dedup_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import similarity_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import advanced  # noqa: F401,E402
from portfolio1_etl_spark.plans import multimodal_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import warehouse_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import sketch_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import clustering_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import graph_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import pq_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import corpus_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import bpe_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import curation_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import classifier_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import robustness_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import ann_index_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import timeseries_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import quality_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import subquery_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import eventflow_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import analytics_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import geo_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import validation_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import relational_deep  # noqa: F401,E402
from portfolio1_etl_spark.plans import mining_ops  # noqa: F401,E402

# MUST import after similarity_ops/pq_ops: composes their registered
# fns and oracle SQL into the on-scoreboard recall row.
from portfolio1_etl_spark.plans import ann_recall_ops  # noqa: F401,E402
from portfolio1_etl_spark.plans import dedup_recall_ops  # noqa: F401,E402

#: Explicit registry order. External correctness harnesses may sample a
#: prefix of ``queries()`` (the driver checks the first 50 entries), so
#: the prefix must contain at least one representative of EVERY operator
#: family. ROTATED each round (r14): 13 of the 50 slots now hold queries
#: that have NEVER been under the external gate in any round (q290 MP4
#: extraction — the r13 verdict's top rotation priority — plus q102,
#: q198, q201, q217, q218, q221, q224, q230, q233, q266, q286, q287),
#: and 3 slots re-gate code THIS round changed (q34 percentile rewrite,
#: q263 signed-diff/manifest-schema/overlapped chains, q265 overlapped
#: IVF-PQ build; q114/q129/q168 remain in-window and re-gate the same
#: machinery). Every swap stays INSIDE its operator family
#: (test_registry_order pins the map); the rotated-out members stay
#: covered by the full-registry oracle + fuzz
#: (test_demoted_queries_still_oracle_backed). Deliberately KEPT
#: in-window: q01 (entry flagship), q43 (EP3 reference pipeline),
#: q168 (commit primitive), q93/q104 (clustering/bloom plan shapes),
#: q114 (the ANN scoreboard).
PRIORITY: tuple[str, ...] = (
    # relational core representatives
    "q01_pricing_summary",      # flagship group-by agg (entry())
    "q247_bag_set_ops",         # set family
    "q218_supplier_part_variety",  # partsupp fact-fact variety (r14: never gated)
    "q262_ratio_to_parent",     # hierarchy shares
    "q238_variant_shredding",   # json family (kept: VARIANT flagship)
    "q28_pivot",                # pivot family
    "q198_volume_shipping",     # TPC-H Q7 star shape (r14: never gated)
    "q183_fuzzy_part_linkage",  # blocked similarity join (never gated)
    "q34_percentiles",          # exact percentiles (r14: re-gates the shared-buffer+spread rewrite)
    "q234_value_histogram",     # width-bucket collect agg (never gated)
    "q269_mmr_diversified_topk",  # diversified top-k (never gated)
    "q179_geo_grid_knn",        # interval-band join (kept)
    "q201_order_count_distribution",  # TPC-H Q13 scalar-agg subquery (r14: never gated)
    # reference EP3 pipeline + warehouse maintenance
    "q43_enriched_sales",
    "q104_bloom_prune",         # bloom family
    "q263_joinview_row_deltas",  # r14: re-gates the signed-diff +
    # manifest-schema + overlapped-chain commit machinery
    "q168_versioned_time_travel",  # commit primitive (kept)
    "q287_kmv_mergeable_rollup",    # KMV mergeable rollup (r14: never gated)
    # streaming batch twins + time-series layer
    "q154_gap_fill_resample",   # stream-window + date-spine (kept)
    "q233_session_stats",    # gaps-and-islands sessions
    "q102_png_decode",  # mapInPandas codec boundary (r14: never gated; re-gates the kept spread)
    "q217_shipping_lag_priority",     # lag window frames (r14: never gated)
    "q230_revenue_acf",       # autocorrelation scan (r14: never gated)
    # text analysis
    "q87_token_histogram",      # corpus token law
    "q96_repetition_filter",    # repetition quality gate
    "q257_tokenizer_fertility", # per-language fertility
    "q119_source_kl",           # per-source LM divergence
    "q109_chunking_bpe",        # BPE chunk packing
    # corpus governance
    "q107_chunking",            # span chunking
    "q85_stratified_sample",    # stratified sampling (never gated)
    "q276_fd_violation_census", # FD profiling data card (never gated)
    # clustering / sketches
    "q93_kmeans",
    "q92_cms_heavy_hitters",
    # mining family
    "q221_rfm_segmentation",  # RFM segmentation mining (r14: never gated)
    # deduplication layer
    "q267_cluster_keep_best",   # survivorship keep-best (never gated)
    "q79_fingerprint_match",
    "q129_dedup_recall",        # strategy scoreboard (kept: re-gates
    # the r14 overlapped leg construction)
    "q112_image_neardup",       # dHash banding + in-pipeline PNG
    # decode (covers dedup-simhash AND multimodal-decode)
    "q286_label_noise_detection",  # embedding-space noise audit (r14: never gated)
    "q97_decontaminate",        # span/shingle removal (kept)
    "q139_leakage_safe_split",  # CC-cluster split keys
    # graph
    "q271_label_propagation",   # iterative LPA (never gated)
    "q163_user_kcore",          # peel family (kept)
    "q224_link_prediction",  # neighborhood link prediction (r14: never gated)
    # similarity search layer
    "q114_ann_recall",          # five-pipeline scoreboard (kept)
    "q260_multiprobe_lsh_ann",  # Hamming-1 probes
    "q265_ivfpq_index_probe",  # composed IVF-PQ (r14: re-gates the overlapped build)
    "q268_matryoshka_recall",   # truncated-dim recall (never gated)
    "q266_maxsim_retrieval",  # MaxSim late interaction (r14: never gated; re-gates the r13 spread)
    # multimodal layer
    "q290_mp4_sample_extract",         # MP4 sample extraction (r14: never gated)
)


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in PRIORITY if n in REGISTRY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["PRIORITY", "REGISTRY", "Query", "query"]
