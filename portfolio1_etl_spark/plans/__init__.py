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
#: family. ROTATED each round (r12): 20 of the 50 slots hold queries
#: that have NEVER been under the external gate in any round — the
#: q196–q237 relational/behavioral long tail (Q7/Q9/Q18/Q22 shapes,
#: deciles, bitmap distinct), the never-gated text/curation members
#: (token histogram, repetition gate, chunking, weighted sampling,
#: table stats, source KL), the r11 eval tier (forecast eval,
#: recommender eval, Jaro-Winkler linkage, IVF incremental ingest,
#: centroid separation, video census, skew diagnostics), and this
#: round's brand-new q288 (incremental aggregate view). Every swap
#: stays INSIDE its operator family (test_registry_order pins the
#: map); the rotated-out members stay covered by the full-registry
#: oracle + fuzz. Deliberately KEPT in-window: q01 (entry flagship),
#: q43 (EP3 reference pipeline), q168 (commit primitive), q93/q104
#: (clustering/bloom plan shapes), q114 (the ANN scoreboard). q73,
#: q254, and q280 sit in the window BECAUSE r12 changed them
#: (verify_candidates' defensive pair-distinct; the hop-2 symmetry
#: halving; exact bigint ppm division) — changed code re-verifies
#: under the external gate.
PRIORITY: tuple[str, ...] = (
    # relational core representatives
    "q01_pricing_summary",      # flagship group-by agg (entry())
    "q247_bag_set_ops",         # set family
    "q203_large_volume_customers",  # TPC-H Q18 fact-fact (never gated)
    "q262_ratio_to_parent",     # hierarchy shares
    "q238_variant_shredding",   # json family (kept: VARIANT flagship)
    "q28_pivot",                # pivot family
    "q205_profit_by_nation_year",  # TPC-H Q9 star shape (never gated)
    "q246_asof_nearest",        # nearest as-of join
    "q280_skew_diagnostics",    # exact order-stat profiler (never
    # gated; re-gates THIS round's integer-division ppm fix)
    "q182_bitmap_distinct",     # bitmap collect-agg (never gated)
    "q181_price_size_skyline",  # skyline top-set
    "q179_geo_grid_knn",        # interval-band join (kept)
    # reference EP3 pipeline + warehouse maintenance
    "q167_untapped_customers",  # TPC-H Q22 anti-subquery (never gated)
    "q43_enriched_sales",
    "q104_bloom_prune",         # bloom family
    "q263_joinview_row_deltas", # DELETE/MERGE commits -> join view
    "q288_aggview_row_deltas",  # r12 NEW: incremental AGG view (never gated)
    "q168_versioned_time_travel",  # commit primitive (kept)
    # streaming batch twins + time-series layer
    "q154_gap_fill_resample",   # stream-window + date-spine (kept)
    "q175_activity_islands",    # gaps-and-islands sessions
    "q272_jaro_winkler_linkage",  # Arrow-UDF linkage (never gated)
    "q170_balance_deciles",     # ntile/percent_rank frames (never gated)
    "q285_forecast_eval",       # rolling-origin eval board (never gated)
    # text analysis
    "q87_token_histogram",      # corpus token law (never gated)
    "q96_repetition_filter",    # repetition quality gate (never gated)
    "q257_tokenizer_fertility", # per-language fertility
    "q119_source_kl",           # per-source LM divergence (never gated)
    "q109_chunking_bpe",        # BPE chunk packing
    # corpus governance
    "q107_chunking",            # span chunking (never gated)
    "q106_weighted_sample",     # deterministic weighted sampling (never gated)
    "q138_table_stats",         # data-card profiling (never gated)
    # clustering / sketches / reconcile
    "q93_kmeans",
    "q92_cms_heavy_hitters",
    "q172_replica_reconcile",
    # mining family
    "q284_recommender_eval",    # temporal-split hit rate (never gated)
    # deduplication layer
    "q71_dedup_exact_keep",
    "q79_fingerprint_match",
    "q73_minhash_lsh",          # re-gates r12 defensive pair-distinct
    "q112_image_neardup",       # dHash banding (decodes PNGs in-pipeline)
    "q250_label_centroid_separation",  # embedding-space audit (never gated)
    "q97_decontaminate",        # span/shingle removal (kept)
    "q139_leakage_safe_split",  # CC-cluster split keys
    # graph
    "q243_transitive_closure",  # path-doubling closure
    "q163_user_kcore",          # peel family (kept)
    "q254_neighborhood_features",  # re-gates THIS round's hop-2
    # symmetry halving (never gated; the r11 scaling `weak` fix)
    # similarity search layer
    "q114_ann_recall",          # five-pipeline scoreboard (kept)
    "q260_multiprobe_lsh_ann",  # Hamming-1 probes
    "q270_ivf_incremental_ingest",  # frozen-codebook ingest (never gated)
    "q253_hard_negative_mining",  # contrastive margins
    # multimodal layer
    "q149_video_metadata_census",  # container census (never gated)
)


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in PRIORITY if n in REGISTRY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["PRIORITY", "REGISTRY", "Query", "query"]
