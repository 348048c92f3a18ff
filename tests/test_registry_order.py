"""The driver's correctness gate samples a PREFIX of ``queries()``
(round 1: exactly the first 50 entries in iteration order). These
tests pin the explicit ordering in ``plans/__init__.PRIORITY`` so
every operator family keeps a driver-visible correctness row.
"""

from __future__ import annotations

import re

from portfolio1_etl_spark.plans import PRIORITY, REGISTRY

WINDOW = 50


def test_priority_names_all_registered():
    missing = [n for n in PRIORITY if n not in REGISTRY]
    assert not missing, f"PRIORITY names without a registered query: {missing}"


def test_priority_is_registry_prefix():
    names = list(REGISTRY)
    assert names[: len(PRIORITY)] == list(PRIORITY)


def test_every_operator_family_inside_window():
    """One representative of each family must sit in the first WINDOW
    entries — the part of the registry an external prefix-sampling
    harness actually checks."""
    window = set(list(REGISTRY)[:WINDOW])
    # r10 ROTATION: 28 of the 50 window slots hold queries never
    # previously under the external gate (incl. the new q239/q240/q241
    # storage + codec rows); each family keeps one representative in
    # the window, and everything rotated out stays oracle-backed for
    # CI (test_demoted_queries_still_oracle_backed).
    families = {
        "relational-agg": "q01_pricing_summary",
        "sets": "q247_bag_set_ops",  # r10: bag INTERSECT/EXCEPT ALL (was q26)
        "fact-fact-join": "q130_salted_join",  # the skew-salted shape
        "topk": "q219_dominant_suppliers",  # top-over-agg (was q189)
        "hierarchical-agg": "q245_rollup_grouping_labels",  # r10 (was q17)
        "json": "q238_variant_shredding",  # kept: VARIANT flagship
        "pivot-family": "q28_pivot",  # rotate-back (was q39)
        "star-join": "q84_local_supplier_volume",  # TPC-H Q5 shape
        "exotic-join": "q88_lateral_topn",  # was q31 full outer
        "stats-agg": "q177_group_regression",  # was q190 winsorized
        "collect-agg": "q195_hll_distinct",  # approx-agg (was q35)
        "interval-join": "q179_geo_grid_knn",  # kept
        "subquery-scalar": "q188_min_balance_supplier",  # TPC-H Q2
        "curation-pack": "q121_sequence_pack_bpe",  # was q117
        "curation-schedule": "q140_mixture_temperature",  # was q120
        "curation-card": "q215_rule_quality_gates",  # was q174
        "pipeline": "q43_enriched_sales",
        "merge-upsert": "q239_merge_into_chain",  # r10: MERGE as an
        # O(delta) transactional commit, not just a query shape
        "cdc": "q240_widened_chain",  # r10: boundary feed across a
        # type promotion, read from the captured delta files
        "warehouse-txn": "q168_versioned_time_travel",  # re-gates the
        # r10 local-path CAS rework (os.link putIfAbsent)
        "stream-window": "q154_gap_fill_resample",
        "stream-session": "q233_session_stats",  # was q52
        "udf-shapes": "q132_udf_scalar_tokens",  # was q133
        "window-frame": "q225_dyadic_ewma",  # was q178 EWMA — the
        # same recursive-smoothing frame, dyadic-exact
        "date-spine": "q154_gap_fill_resample",
        "text-words": "q249_heaps_law",  # r10: vocab-growth OLS (was q87)
        "text-quality": "q214_repetition_ratio",  # was q126 logreg
        "text-langid": "q69_langid_classifier",
        "text-lm": "q141_bigram_logprob",  # was q148 KN
        "text-bpe": "q123_bpe_train",  # was q136 pack
        "dedup-exact": "q71_dedup_exact_keep",
        "dedup-fingerprint": "q79_fingerprint_match",  # was q72
        "dedup-minhash": "q73_minhash_lsh",
        "dedup-simhash": "q75_simhash_pairs",  # was q74
        "dedup-embedding": "q78_embedding_neardup",
        "dedup-spans": "q97_decontaminate",  # was q159 — the shingle
        # span-removal decontamination is the family core
        "dedup-cc": "q150_neardup_triangles",  # was q89
        "graph-iterative": "q211_personalized_pagerank",  # was q191
        "graph-peel": "q163_user_kcore",  # kept
        "sketch-cms": "q92_cms_heavy_hitters",
        "sketch-bloom": "q104_bloom_prune",
        "digest-reconcile": "q172_replica_reconcile",
        "cluster-kmeans": "q93_kmeans",
        "sim-knn": "q114_ann_recall",  # the knn recall scoreboard
        "sim-lsh": "q82_lsh_ann",
        "sim-ivf": "q135_ivf_index_probe",
        "sim-quantized": "q252_rrf_fusion",  # r10: re-gates the SQ8
        # ranker inside the fusion (PQ stays oracle-backed via q99/q103)
        "multimodal-decode": "q241_adts_census",  # r10: mixed
        # MPEG/ADTS transport census (was q145 GIF)
        "multimodal-governance": "q147_exif_tiff_census",  # was q164
        "timeseries": "q210_value_percentiles_daily",  # was q193
        "mining": "q226_touch_attribution",  # was q220
    }
    outside = {f: q for f, q in families.items() if q not in window}
    assert not outside, f"families outside the {WINDOW}-entry window: {outside}"


def test_demoted_queries_still_oracle_backed():
    """Everything past the window still has SQL for tools/check_oracle.py
    (CI covers what the driver prefix does not)."""
    tail = list(REGISTRY)[WINDOW:]
    no_sql = [n for n in tail if REGISTRY[n].sql is None]
    assert not no_sql, f"demoted queries with no oracle SQL: {no_sql}"


def test_query_names_follow_convention():
    assert all(re.match(r"^q\d{2,3}_[a-z0-9_]+$", n) for n in REGISTRY)
