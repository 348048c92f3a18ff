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
#: family. ROTATED each round (r9): 19 of the 50 slots hold queries NOT
#: in the r8 window — 16 that had NEVER been under the external gate
#: (q163, q164, q168, q172, q174, q178, q179, q185, q187, q189–q193,
#: plus this round's brand-new q220 mining and q238 VARIANT queries)
#: and 3 rotated back in (q25, q18, q31) — so the external gate
#: re-verifies a different slice of the registry every round instead of
#: re-checking a fixed favored set; everything outside the window stays
#: covered by tools/check_oracle.py (full-registry) and pytest. q159
#: stays in-window deliberately: it was r8's one red row and the fix
#: must be proven by the same gate that caught it.
PRIORITY: tuple[str, ...] = (
    # relational core representatives
    "q01_pricing_summary",      # flagship group-by agg (entry())
    "q25_intersect",            # set family (r9 rotation: was q26 except)
    "q09_sortmerge_join",       # fact-fact join (q29 keeps broadcast rep)
    "q18_cube",                 # hierarchical agg (r9: was q30 gsets)
    "q238_variant_shredding",   # semi-structured parse (r9 session 3,
                                # NEW: the VARIANT shred replaces
                                # q27's fixed-schema from_json as the
                                # family's windowed rep; q27 stays
                                # covered by check_oracle + pytest)
    "q39_unpivot",              # pivot family
    "q29_star_join",            # multi-dim star broadcast
    # advanced joins / aggregates
    "q31_full_outer_join",      # exotic joins (r9: was q176 attribution)
    "q190_winsorized_stats",    # robust stats (r9, never windowed —
                                # was q160 MAD; winsorization composes the
                                # same discrete-percentile bound op)
    "q35_approx_aggregates",
    "q191_bfs_levels",          # graph (r9, never windowed — was q101
                                # pagerank; frontier-join iteration)
    "q179_geo_grid_knn",        # spatial blocked join (r9, never windowed —
                                # was q38 range join; the grid block IS an
                                # interval-band equi-join)
    # reference EP3 pipeline + warehouse maintenance
    "q187_national_market_share",  # scalar subquery vs aggregate (r9,
                                # never windowed — was q153 advisor)
    "q43_enriched_sales",
    "q104_bloom_prune",         # bloom family
    "q192_merge_full_matrix",   # MERGE matrix incl. conditional DELETE
                                # (r9, never windowed — was q180 PIT)
    "q185_incremental_agg",     # matview maintained from the captured CDC
                                # feed (r9, never windowed — was q151 feed)
    # streaming batch twins + time-series layer
    "q154_gap_fill_resample",   # spine composes the bucket window
    "q52_session_window",
    "q133_udf_groupedmap_zscore",  # §2.12 grouped-map shape
    # window frames / navigation / date+ts scalar layers
    "q193_twap_daily",          # time-weighted mean (r9, never windowed —
                                # was q156 rolling median)
    "q120_curation_pipeline",   # governance composite
    "q178_ewma_activity",       # recursive smoothing window (r9, never
                                # windowed — was q155 interpolate)
    "q189_top_revenue_supplier",  # top-over-aggregate (r9, never windowed —
                                # was q59 shipping priority; the same
                                # TakeOrdered-over-agg shape, TPC-H Q15)
    # text analysis
    "q158_char_entropy",
    "q126_logreg_quality",
    "q69_langid_classifier",
    "q148_kneser_ney_logprob",
    "q136_pack_trained_bpe",
    # corpus governance
    "q117_sequence_pack",
    "q174_benford_audit",       # forensic release audit (r9, never
                                # windowed — was q161 DP release; the
                                # publishing-gate family)
    # clustering
    "q93_kmeans",
    # frequency sketches
    "q92_cms_heavy_hitters",
    # mining family
    "q220_association_rules",   # r9, NEW this round — took the slot of
                                # the q100 corpus-prep composite, whose
                                # pieces q71/q73/q74/q117 all stay
                                # in-window individually
    # deduplication layer
    "q71_dedup_exact_keep",
    "q72_ngram_jaccard",
    "q73_minhash_lsh",
    "q74_simhash",
    "q164_exif_privacy_scrub",  # multimodal governance (r9, never
                                # windowed — was q152 MPEG census)
    "q172_replica_reconcile",   # bucketed-digest anti-entropy (r9, never
                                # windowed — was q157 sliding distinct)
    "q78_embedding_neardup",
    "q89_dup_clusters",
    # similarity search layer
    "q80_cosine_topk",
    "q159_bigram_pmi",          # KEPT in-window on purpose: the r8 red
                                # row — the external gate must re-verify
                                # the signed-zero fix, not take CI's word
    "q82_lsh_ann",
    "q135_ivf_index_probe",
    "q163_user_kcore",          # fixed-round peel (r9, never windowed —
                                # was q162 WAV census)
    "q103_pq_sampled_train",
    # transactional storage, end-to-end under the external gate (r9,
    # never windowed — re-gates the staged CAS commit rework externally)
    "q168_versioned_time_travel",
    # multimodal layer
    "q145_gif_animation_census",
)


def _reorder_registry() -> None:
    ordered = {n: REGISTRY[n] for n in PRIORITY if n in REGISTRY}
    ordered.update({n: q for n, q in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_registry()

__all__ = ["PRIORITY", "REGISTRY", "Query", "query"]
