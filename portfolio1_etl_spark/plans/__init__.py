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
#: family. ROTATED each round (r11): 32 of the 50 slots hold queries
#: that have NEVER been under the external gate in any round — the
#: long-unwindowed r9/r10 tail families (skyline, Holt, calibration,
#: fertility, islands, UDTF, subquery-exists, Zipf, …) plus this
#: round's brand-new rows (q263 row-level deltas → join view, q264
#: MP4 stbl census, q265 composed IVF-PQ). Every swap stays INSIDE
#: its operator family (test_registry_order pins the map), so the
#: rotated-out members gate via the full-registry oracle + fuzz
#: instead. Deliberately KEPT in-window: q01 (entry flagship), q43
#: (EP3 reference pipeline), q73 (LSH core), q93/q104 (clustering/
#: bloom plan shapes), q168 — the one-file commit primitive's local-FS
#: branch resolution was reworked THIS round (Hadoop-resolved scheme,
#: not raw string), so the chain commit path re-verifies under the
#: external gate — and q114, whose scoreboard gained the q265 row.
#: q243/q259 enter the window BECAUSE their closure loops were
#: reworked this round (per-round materialization).
#: Everything rotated out stays covered by tools/check_oracle.py
#: (full-registry) and pytest.
PRIORITY: tuple[str, ...] = (
    # relational core representatives
    "q01_pricing_summary",      # flagship group-by agg (entry())
    "q247_bag_set_ops",         # set family (kept from r10)
    "q248_null_safe_join",      # null-safe fact join (never gated)
    "q262_ratio_to_parent",     # hierarchy shares (never gated)
    "q238_variant_shredding",   # json family (kept: VARIANT flagship)
    "q28_pivot",                # pivot family
    "q199_market_share",        # TPC-H Q8 star shape (never gated)
    "q246_asof_nearest",        # nearest as-of join (never gated)
    "q242_weighted_median",     # exact weighted median (never gated)
    "q212_hll_merge_rollup",    # mergeable-sketch rollup (never gated)
    "q181_price_size_skyline",  # skyline top-set (never gated)
    "q179_geo_grid_knn",        # interval-band join (kept)
    # reference EP3 pipeline + warehouse maintenance
    "q166_waiting_suppliers",   # correlated exists subquery (never gated)
    "q43_enriched_sales",
    "q104_bloom_prune",         # bloom family
    "q263_joinview_row_deltas", # r11 NEW: DELETE/MERGE commits -> join view
    "q244_incremental_join_view",  # CDC-fed view algebra (never gated)
    "q168_versioned_time_travel",  # re-gates THIS round's POSIX-branch
    # resolution fix in the one-file commit primitive
    # streaming batch twins + time-series layer
    "q154_gap_fill_resample",   # stream-window + date-spine (kept)
    "q175_activity_islands",    # gaps-and-islands sessions (never gated)
    "q134_udtf_ngrams",         # §2.12 UDTF shape (never gated)
    "q213_consecutive_declines",  # streak frames (never gated)
    "q231_holt_forecast",       # double-exponential smoothing (never gated)
    # text analysis
    "q235_zipf_slope",          # log-log OLS vocab law (never gated)
    "q256_quality_retention_curve",  # threshold ladder (never gated)
    "q257_tokenizer_fertility", # per-language fertility (never gated)
    "q118_unigram_logprob",     # LM gate (never gated)
    "q109_chunking_bpe",        # BPE chunk packing (never gated)
    # corpus governance
    "q122_pack_materialize",    # token-exact packing (never gated)
    "q258_calibration_bins",    # equal-mass calibration (never gated)
    "q186_validation_suite",    # rule battery (never gated)
    # clustering / sketches / reconcile
    "q93_kmeans",
    "q92_cms_heavy_hitters",
    "q172_replica_reconcile",
    # mining family
    "q259_golden_record",       # re-gates THIS round's per-round
    # materialize rework in the survivorship closure (never gated)
    # deduplication layer
    "q71_dedup_exact_keep",
    "q79_fingerprint_match",
    "q73_minhash_lsh",
    "q112_image_neardup",       # dHash pigeonhole banding (never gated)
    "q125_embedding_decontaminate",  # semantic decontamination (never gated)
    "q97_decontaminate",        # span/shingle removal (kept)
    "q139_leakage_safe_split",  # CC-cluster split keys (never gated)
    # graph
    "q243_transitive_closure",  # re-gates THIS round's per-round
    # materialize rework in the path-doubling closure (never gated)
    "q163_user_kcore",          # peel family (kept)
    # similarity search layer
    "q114_ann_recall",          # scoreboard EXTENDED this round (q265 row)
    "q260_multiprobe_lsh_ann",  # Hamming-1 probes (never gated)
    "q265_ivfpq_index_probe",   # r11 NEW: composed IVF-PQ index
    "q253_hard_negative_mining",  # contrastive margins (never gated)
    # multimodal layer
    "q144_adpcm_decode",        # ADPCM state-machine decode (never gated)
    "q264_mp4_sample_table_census",  # r11 NEW: stbl census
)


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in PRIORITY if n in REGISTRY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["PRIORITY", "REGISTRY", "Query", "query"]
