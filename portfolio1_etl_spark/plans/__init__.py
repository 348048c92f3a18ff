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
#: family. ROTATED each round (r10): 42 of the 50 slots hold queries
#: that have NEVER been under the external gate in any round — the
#: r9 families (q210–q237), this round's brand-new rows (q239 delta
#: MERGE, q240 widened chain, q241 ADTS census, q245/q247 grouping +
#: bag set-ops, q249 Heaps, q252 RRF) — every swap stays INSIDE its
#: operator family (test_registry_order pins the map), so q250/q251/
#: q253–q257 gate via the full-registry oracle + fuzz instead, and
#: long-unwindowed members of every family (each slot keeps its
#: family, so coverage breadth is unchanged). Deliberately KEPT
#: in-window: q01 (entry flagship), q43 (EP3 reference pipeline),
#: q73 (LSH core), q93/q104/q135 (clustering/bloom/persisted-index
#: plan shapes), and q168 — the local-path CAS commit primitive was
#: reworked THIS round (os.link putIfAbsent), so the chain commit
#: path must be re-verified by the external gate, not just CI.
#: Everything rotated out stays covered by tools/check_oracle.py
#: (full-registry) and pytest.
PRIORITY: tuple[str, ...] = (
    # relational core representatives
    "q01_pricing_summary",      # flagship group-by agg (entry())
    "q247_bag_set_ops",         # set family: INTERSECT/EXCEPT ALL (r10 NEW)
    "q130_salted_join",         # skew-salted fact join (never gated)
    "q245_rollup_grouping_labels",  # hierarchical agg + GROUPING bits (r10 NEW)
    "q238_variant_shredding",   # json family (kept: VARIANT flagship)
    "q28_pivot",                # pivot family (rotate-back)
    "q84_local_supplier_volume",  # TPC-H Q5 star shape (never gated)
    # advanced joins / aggregates
    "q88_lateral_topn",         # lateral/exotic join (never gated)
    "q177_group_regression",    # per-group OLS stats (never gated)
    "q195_hll_distinct",        # approx/collect agg (never gated)
    "q219_dominant_suppliers",  # top-over-aggregate (never gated)
    "q179_geo_grid_knn",        # interval-band join (kept)
    # reference EP3 pipeline + warehouse maintenance
    "q188_min_balance_supplier",  # correlated subquery (never gated)
    "q43_enriched_sales",
    "q104_bloom_prune",         # bloom family
    "q239_merge_into_chain",    # r10 NEW: row-level delta MERGE commit
    "q240_widened_chain",       # r10 NEW: type-widening evolution + CDC
    "q168_versioned_time_travel",  # re-gates THIS round's local CAS rework
    # streaming batch twins + time-series layer
    "q154_gap_fill_resample",   # stream-window + date-spine (kept)
    "q233_session_stats",       # sessionization (never gated)
    "q132_udf_scalar_tokens",   # §2.12 pandas-UDF shape (never gated)
    "q225_dyadic_ewma",         # recursive frame smoothing (never gated)
    "q210_value_percentiles_daily",  # daily series stats (never gated)
    # text analysis
    "q249_heaps_law",           # token/vocab stats (r10 NEW)
    "q214_repetition_ratio",    # quality gate (never gated)
    "q69_langid_classifier",    # (never gated)
    "q141_bigram_logprob",      # LM gate (never gated)
    "q123_bpe_train",           # BPE training (never gated)
    # corpus governance
    "q121_sequence_pack_bpe",   # token-exact packing (never gated)
    "q140_mixture_temperature", # mixture scheduling (never gated)
    "q215_rule_quality_gates",  # release battery (never gated)
    # clustering / sketches / reconcile
    "q93_kmeans",
    "q92_cms_heavy_hitters",
    "q172_replica_reconcile",
    # mining family
    "q226_touch_attribution",   # (never gated)
    # deduplication layer
    "q71_dedup_exact_keep",
    "q79_fingerprint_match",    # winnowing match (never gated)
    "q73_minhash_lsh",
    "q75_simhash_pairs",        # simhash banding (never gated)
    "q97_decontaminate",        # span/shingle removal (never gated)
    "q78_embedding_neardup",    # (never gated)
    "q150_neardup_triangles",   # dup-graph transitivity (never gated)
    # graph
    "q211_personalized_pagerank",  # iterative (never gated)
    "q163_user_kcore",          # peel family (kept)
    # similarity search layer
    "q114_ann_recall",          # knn recall scoreboard (never gated)
    "q82_lsh_ann",
    "q135_ivf_index_probe",
    "q252_rrf_fusion",          # r10 NEW: re-gates the SQ8 quantized ranker + fusion
    # multimodal layer
    "q241_adts_census",         # r10 NEW: mixed MPEG/ADTS census
    "q147_exif_tiff_census",    # governance (never gated)
)


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in PRIORITY if n in REGISTRY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["PRIORITY", "REGISTRY", "Query", "query"]
