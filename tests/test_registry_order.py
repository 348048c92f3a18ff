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
    families = {
        "relational-agg": "q01_pricing_summary",
        "union": "q07_union_channels",
        "broadcast-join": "q08_broadcast_join",
        "topk": "q59_shipping_priority",  # TakeOrderedAndProject shape
        "rollup": "q17_rollup",
        "json": "q27_json_extract",
        "pivot": "q28_pivot",
        "star-join": "q29_star_join",
        "outer-join": "q31_full_outer_join",
        "stats-agg": "q33_stats_agg",
        "approx-agg": "q35_approx_aggregates",
        "asof-join": "q37_asof_join",
        # range-join demoted r6 (interval joins stay repped by the
        # as-of family; q38 stays oracle-backed for CI), as was the
        # cross-join (repped by the outer-join exotic family; q32 CI)
        "curation-redact": "q115_pii_redact",
        "curation-mixture": "q116_mixture_sample",
        "pipeline": "q43_enriched_sales",
        "scd2": "q46_scd2_intervals",
        "merge-upsert": "q47_merge_upsert",
        "stream-window": "q50_tumbling_window",
        "stream-session": "q52_session_window",
        "stream-dedup": "q53_dedup_first_event",
        "window-frame": "q55_window_range_frame",
        "text-tokens": "q60_token_stats",
        "text-quality": "q62_quality_score",
        "text-langid": "q63_lang_id",
        "text-tfidf": "q94_tfidf",
        "text-bpe": "q108_bpe_tokenize",
        "dedup-exact": "q71_dedup_exact_keep",
        "dedup-jaccard": "q72_ngram_jaccard",
        "dedup-minhash": "q73_minhash_lsh",
        "dedup-simhash": "q74_simhash",
        # winnowing fingerprints demoted r6 (repped by the simhash
        # fingerprint family; q76 stays oracle-backed for CI)
        "dedup-dfcap": "q77_jaccard_dfcap",
        "dedup-embedding": "q78_embedding_neardup",
        "dedup-cc": "q89_dup_clusters",
        "graph-pagerank": "q98_pagerank",
        "sketch-cms": "q92_cms_heavy_hitters",
        "cluster-kmeans": "q93_kmeans",
        "sim-knn": "q80_cosine_topk",
        "sim-lsh": "q82_lsh_ann",
        "sim-ivf": "q83_ivf_ann",
        "sim-quantized": "q95_quantized_ann",
        "sim-pq": "q99_pq_ann",
        "multimodal": "q90_multimodal_featurize",
        "multimodal-decode": "q91_multimodal_decode",
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
