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
    # r11 ROTATION: 32 of the 50 window slots hold queries never
    # previously under the external gate (incl. the new q263/q264/q265
    # storage + index rows); each family keeps one representative in
    # the window, and everything rotated out stays oracle-backed for
    # CI (test_demoted_queries_still_oracle_backed).
    families = {
        "relational-agg": "q01_pricing_summary",
        "sets": "q247_bag_set_ops",
        "fact-fact-join": "q248_null_safe_join",  # r11: null-safe
        # equality join (the salted q130 shape stays oracle-backed)
        "topk": "q181_price_size_skyline",  # r11: skyline top-set
        "hierarchical-agg": "q262_ratio_to_parent",  # r11 (was q245)
        "json": "q238_variant_shredding",  # kept: VARIANT flagship
        "pivot-family": "q28_pivot",
        "star-join": "q199_market_share",  # r11: TPC-H Q8 (was q84 Q5)
        "exotic-join": "q246_asof_nearest",  # r11: nearest as-of (was q88)
        "stats-agg": "q242_weighted_median",  # r11 (was q177)
        "collect-agg": "q212_hll_merge_rollup",  # r11: mergeable
        # sketch rollup (was q195 plain HLL)
        "interval-join": "q179_geo_grid_knn",  # kept
        "subquery-scalar": "q166_waiting_suppliers",  # r11: correlated
        # EXISTS (was q188 scalar min)
        "curation-pack": "q122_pack_materialize",  # r11 (was q121)
        "curation-schedule": "q258_calibration_bins",  # r11 (was q140)
        "curation-card": "q186_validation_suite",  # r11 (was q215)
        "pipeline": "q43_enriched_sales",
        "merge-upsert": "q263_joinview_row_deltas",  # r11 NEW: the
        # DELETE/MERGE delta commits drive an incremental join view
        "cdc": "q244_incremental_join_view",  # r11: CDC-fed Z-relation
        # view algebra (was q240 widening feed)
        "warehouse-txn": "q168_versioned_time_travel",  # re-gates the
        # r11 local-FS branch-resolution fix in the commit primitive
        "stream-window": "q154_gap_fill_resample",
        "stream-session": "q175_activity_islands",  # r11: gaps-and-
        # islands sessionization (was q233 window-native sessions)
        "udf-shapes": "q134_udtf_ngrams",  # r11: UDTF (was q132 scalar)
        "window-frame": "q213_consecutive_declines",  # r11 (was q225)
        "date-spine": "q154_gap_fill_resample",
        "text-words": "q235_zipf_slope",  # r11 (was q249 Heaps)
        "text-quality": "q256_quality_retention_curve",  # r11 (was q214)
        "text-langid": "q257_tokenizer_fertility",  # r11: per-language
        # fertility reuses the q69 profile (was q69)
        "text-lm": "q118_unigram_logprob",  # r11 (was q141)
        "text-bpe": "q109_chunking_bpe",  # r11 (was q123)
        "dedup-exact": "q71_dedup_exact_keep",
        "dedup-fingerprint": "q79_fingerprint_match",
        "dedup-minhash": "q73_minhash_lsh",
        "dedup-simhash": "q112_image_neardup",  # r11: dHash pigeonhole
        # banding — the simhash family's image member (was q75)
        "dedup-embedding": "q125_embedding_decontaminate",  # r11 (was q78)
        "dedup-spans": "q97_decontaminate",  # kept
        "dedup-cc": "q139_leakage_safe_split",  # r11: split keys ARE
        # the CC cluster ids (was q150 triangles)
        "graph-iterative": "q243_transitive_closure",  # r11: re-gates
        # the per-round materialize rework (was q211)
        "graph-peel": "q163_user_kcore",  # kept
        "sketch-cms": "q92_cms_heavy_hitters",
        "sketch-bloom": "q104_bloom_prune",
        "digest-reconcile": "q172_replica_reconcile",
        "cluster-kmeans": "q93_kmeans",
        "sim-knn": "q114_ann_recall",  # kept: board gained the q265 row
        "sim-lsh": "q260_multiprobe_lsh_ann",  # r11 (was q82)
        "sim-ivf": "q265_ivfpq_index_probe",  # r11 NEW: composed
        # IVF-PQ persisted index (was q135 plain IVF)
        "sim-quantized": "q253_hard_negative_mining",  # r11: margin
        # mining over the quantized sims (was q252 RRF)
        "multimodal-decode": "q144_adpcm_decode",  # r11: ADPCM state
        # machine (was q241 ADTS)
        "multimodal-governance": "q264_mp4_sample_table_census",  # r11
        # NEW: stbl census (was q147 EXIF)
        "timeseries": "q231_holt_forecast",  # r11 (was q210)
        "mining": "q259_golden_record",  # r11: re-gates the per-round
        # materialize rework in the survivorship closure (was q226)
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
