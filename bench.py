"""Benchmark runner — the driver's perf feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with the ``noop`` datasource write —
full execution, no driver-side collect, no sink I/O in the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from portfolio1_etl_spark import get_spark
from portfolio1_etl_spark.plans import REGISTRY

#: Headline set: one per operator family that dominates runtime at scale.
HEADLINE = [
    "q01_pricing_summary",
    "q03_project_derive",
    "q08_broadcast_join",
    "q09_sortmerge_join",
    "q10_right_join_multiplier",
    "q16_agg_multi",
    "q19_window_rank",
    "q24_having",
    "q29_star_join",
    "q37_asof_join",
    "q84_local_supplier_volume",
    "q59_shipping_priority",
    "q38_range_join",
    "q41_soldvalue_retail",
    "q43_enriched_sales",
    "q50_tumbling_window",
    "q52_session_window",
    "q61_word_frequency",
    "q71_dedup_exact_keep",
    "q72_ngram_jaccard",
    "q73_minhash_lsh",
    "q74_simhash",
    "q77_jaccard_dfcap",
    "q89_dup_clusters",
    "q92_cms_heavy_hitters",
    "q93_kmeans",
    "q98_pagerank",
    "q80_cosine_topk",
    "q82_lsh_ann",
    "q83_ivf_ann",
    "q95_quantized_ann",
    "q99_pq_ann",
    "q90_multimodal_featurize",
    "q91_multimodal_decode",
    "q100_corpus_prep",
    "q101_pagerank_dangling",
    "q102_png_decode",
    "q103_pq_sampled_train",
    "q104_bloom_prune",
    "q105_prefix_jaccard",
    "q106_weighted_sample",
    "q107_chunking",
    "q108_bpe_tokenize",
    "q109_chunking_bpe",
    "q110_span_dedup",
    "q111_image_dhash",
    "q112_image_neardup",
    "q114_ann_recall",
    "q115_pii_redact",
    "q116_mixture_sample",
    "q117_sequence_pack",
    "q118_unigram_logprob",
    "q119_source_kl",
    "q120_curation_pipeline",
    "q121_sequence_pack_bpe",
    "q122_pack_materialize",
    "q123_bpe_train",
    "q124_bpe_train_apply",
    "q125_embedding_decontaminate",
    "q127_data_card",
    "q128_curriculum_schedule",
    "q129_dedup_recall",
    "q130_salted_join",
    "q131_udaf_geomean",
    "q132_udf_scalar_tokens",
    "q133_udf_groupedmap_zscore",
    "q134_udtf_ngrams",
    # r7 additions: persisted IVF index (build + DPP probe), packing
    # under the trained BPE vocabulary, header-only metadata census
    "q135_ivf_index_probe",
    "q136_pack_trained_bpe",
    "q137_media_metadata_census",
    "q138_table_stats",
    "q139_leakage_safe_split",
    "q140_mixture_temperature",
    "q141_bigram_logprob",
    # lossy-format pixel decode (JPEG Huffman/DCT, GIF LZW, BMP)
    "q142_lossy_pixel_census",
    # compressed-audio decode (G.711 mu-law; IMA ADPCM state machine)
    "q143_mulaw_decode",
    "q144_adpcm_decode",
    # animated-GIF frame compositing census
    "q145_gif_animation_census",
    # format normalization (transcode to PNG) pixel-losslessness
    "q146_transcode_census",
    # TIFF decode + EXIF orientation normalization
    "q147_exif_tiff_census",
    # Kneser-Ney bigram LM scoring
    "q148_kneser_ney_logprob",
    # header-only MP4 video metadata census
    "q149_video_metadata_census",
    # degree-oriented triangle counting over the near-dup graph
    "q150_neardup_triangles",
    # CDC change feed with keyed Delta-CDF reclassification
    "q151_change_data_feed",
    # header-only MPEG audio bitrate/duration census
    "q152_audio_bitrate_census",
    # stats-driven broadcast-vs-sort-merge advice
    "q153_join_strategy_advisor",
    # time-series layer: gap-fill, interpolate, rolling median,
    # sliding distinct users
    "q154_gap_fill_resample",
    "q155_linear_interpolate",
    "q156_rolling_median",
    "q157_sliding_distinct_users",
    # corpus-quality statistics: char entropy, PMI collocations,
    # MAD outliers, DP count release
    "q158_char_entropy",
    "q159_bigram_pmi",
    "q160_mad_outliers",
    "q161_dp_count_release",
    # WAV waveform census (silence / RMS / runs)
    "q162_wav_silence_census",
    # 2-core of the user co-occurrence graph (fixed-round peel)
    "q163_user_kcore",
    # EXIF privacy scrub (whitelist rebuild; GPS removal re-parsed)
    "q164_exif_privacy_scrub",
    # correlated-subquery shapes (TPC-H Q17/Q21/Q22 analogues)
    "q165_small_quantity_revenue",
    "q166_waiting_suppliers",
    "q167_untapped_customers",
    # manifest chain end-to-end: write, time travel, captured feed
    "q168_versioned_time_travel",
    # date-window EXISTS with cross-table comparison (TPC-H Q4 shape)
    "q169_priority_late_orders",
    # distribution-ranking window trio (ntile/percent_rank/cume_dist)
    "q170_balance_deciles",
    # behavioral 3-step path mining over event sequences
    "q171_event_path_trigrams",
    # anti-entropy replica reconciliation (bucketed content digests)
    "q172_replica_reconcile",
    # chi-square categorical-independence audit
    "q173_chi_square_independence",
    # Benford leading-digit forensic audit
    "q174_benford_audit",
    # event-flow analytics: gaps-and-islands, touch attribution
    "q175_activity_islands",
    "q176_touch_attribution",
    # grouped least-squares regression from integer moment sums
    "q177_group_regression",
    # EWMA activity smoothing (closed-form, bit-exact dyadic weights)
    "q178_ewma_activity",
    # Pareto frontier via the distinct-price sweep
    "q181_price_size_skyline",
    # grid-blocked haversine nearest-neighbor join
    "q179_geo_grid_knn",
    # point-in-time join against the SCD2 dimension
    "q180_pit_scd2_join",
    # bitmap-aggregate exact distinct counting
    "q182_bitmap_distinct",
    # blocked fuzzy record linkage (levenshtein inside blocks)
    "q183_fuzzy_part_linkage",
    # ABC / Pareto revenue classification (exact-decimal cumsum)
    "q184_abc_classification",
    # incremental matview maintenance from the captured CDC feed
    "q185_incremental_agg",
    # single-pass declarative data-quality suite
    "q186_validation_suite",
    # scalar-subquery shapes (TPC-H Q11/Q2/Q15 analogues)
    "q187_national_market_share",
    "q188_min_balance_supplier",
    "q189_top_revenue_supplier",
    # winsorized robust mean at discrete-percentile bounds
    "q190_winsorized_stats",
    # BFS hop levels over the co-purchase graph (frontier expansion)
    "q191_bfs_levels",
    # full Delta-style MERGE matrix incl. conditional DELETE
    "q192_merge_full_matrix",
    # time-weighted average value (exact decimal x microsecond gaps)
    "q193_twap_daily",
    # r9 additions: MP3 VBR seek-header census, HLL cardinality
    # sketch, ordered funnel, weekly retention cohorts
    "q194_mp3_vbr_census",
    "q195_hll_distinct",
    "q196_funnel_conversion",
    "q197_retention_cohorts",
    # deep relational analogues (TPC-H Q7/Q8/Q9/Q10/Q13/Q14/Q18/Q19)
    "q198_volume_shipping",
    "q199_market_share",
    "q200_returned_items",
    "q201_order_count_distribution",
    "q202_promo_revenue",
    "q203_large_volume_customers",
    "q204_disjunctive_revenue",
    "q205_profit_by_nation_year",
    # behavioral modeling, experimentation, web-corpus prep
    "q206_event_transitions",
    "q207_ab_conversion_ztest",
    "q208_html_strip",
    # ops-monitoring: seasonal anomaly flags, percentile dashboards
    "q209_seasonality_anomaly",
    "q210_value_percentiles_daily",
    # personalized PageRank (proximity-to-seed-set graph primitive)
    "q211_personalized_pagerank",
    # sketch algebra + sequential pattern mining
    "q212_hll_merge_rollup",
    "q213_consecutive_declines",
    # within-document repetition + rule-battery quality gates
    "q214_repetition_ratio",
    "q215_rule_quality_gates",
    "q216_forecast_revenue_change",
    "q217_shipping_lag_priority",
    "q218_supplier_part_variety",
    "q219_dominant_suppliers",
    "q220_association_rules",
    "q221_rfm_segmentation",
    "q222_abc_migration",
    "q223_gini_concentration",
    "q224_link_prediction",
    "q225_dyadic_ewma",
    "q226_touch_attribution",
    "q227_histogram_quantiles",
    "q228_cohort_ltv",
    "q229_cusum_changepoint",
    "q230_revenue_acf",
    "q231_holt_forecast",
    "q232_interevent_burstiness",
    "q233_session_stats",
    "q234_value_histogram",
    "q235_zipf_slope",
    "q236_holt_backtest",
    "q237_clustering_coefficient",
    "q238_variant_shredding",
]


def _previous_round_timings(here: str) -> tuple[str, dict[str, float]] | None:
    """Newest usable per-query baseline for the regression guard:
    driver-recorded BENCH_r{N}.json and in-repo bench_full_r{N}.json
    considered together, newest round first, first one that parses
    wins — the driver capture truncates to a log tail and has shipped
    unparseable (r8), which must not silently disable the guard when
    a committed full artifact exists."""
    import glob
    import re

    def _round_no(p: str) -> int | None:
        m = re.search(r"(?:BENCH|bench_full)_r0*(\d+)\.json$", os.path.basename(p))
        return int(m.group(1)) if m else None

    by_round: dict[int, list[str]] = {}
    for pat in ("BENCH_r*.json", "bench_full_r*.json"):
        for p in glob.glob(os.path.join(here, pat)):
            rn = _round_no(p)
            if rn is not None:
                by_round.setdefault(rn, []).append(p)

    def _queries(path: str) -> dict[str, float] | None:
        try:
            with open(path) as f:
                data = json.load(f)
            parsed = data.get("parsed") or data
            return dict(parsed["queries"])
        except (OSError, KeyError, TypeError, ValueError, json.JSONDecodeError):
            return None

    for rn in sorted(by_round, reverse=True):
        # Merge every parseable artifact of the round; a tail-truncated
        # driver capture must not shadow the committed full artifact, so
        # bench_full (sorted last) overwrites BENCH on shared queries.
        merged: dict[str, float] = {}
        used: list[str] = []
        for path in sorted(by_round[rn], key=lambda p: "bench_full" in p):
            qs = _queries(path)
            if qs:
                merged.update(qs)
                used.append(os.path.basename(path))
        if merged:
            return "+".join(used), merged
    return None


def _regression_report(timings: dict[str, float], here: str) -> None:
    """Per-query delta vs the previous round, >2x regressions called
    out — machine-checkable round-over-round perf, on stderr so the
    stdout contract stays ONE JSON line."""
    prev = _previous_round_timings(here)
    if prev is None:
        return
    fname, base = prev
    print(f"# regression check vs {fname}", file=sys.stderr)
    regressions = []
    for name, t in timings.items():
        if name not in base:
            print(f"#   {name}: {t:.3f}s (new — no baseline)", file=sys.stderr)
            continue
        ratio = t / base[name] if base[name] > 0 else float("inf")
        flag = " REGRESSION(>2x)" if ratio > 2.0 else ""
        print(
            f"#   {name}: {t:.3f}s vs {base[name]:.3f}s ({ratio:.2f}x){flag}",
            file=sys.stderr,
        )
        if ratio > 2.0:
            regressions.append(name)
    if regressions:
        print(f"# WARNING: >2x regressions: {regressions}", file=sys.stderr)


def _write_full_artifact(
    timings: dict[str, float], total: float, sf: float, here: str
) -> None:
    """Persist ALL headline timings to ``bench_full_r{N}.json`` in the
    repo (N = latest driver-recorded round + 1). The driver's own
    BENCH capture truncates to a log tail (r8 kept 61 of 105 rows),
    which degraded round-over-round comparison to whatever survived —
    this artifact is the durable, complete record, committed each
    round."""
    import glob
    import re

    # round number from the newest BENCH_r{N}.json FILENAME — never
    # its contents (r8's tail-truncated capture was unparseable, which
    # must not reset the numbering)
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", os.path.basename(p)))
    ]
    n = (max(rounds) + 1) if rounds else 1
    out = os.path.join(here, f"bench_full_r{n}.json")
    with open(out, "w") as f:
        json.dump(
            {
                "round": n,
                "sf": sf,
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "runs_per_query": 3,
                "queries": timings,
            },
            f,
            indent=1,
        )
        f.write("\n")
    print(f"# wrote {out} ({len(timings)} queries)", file=sys.stderr)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark(app_name="bench")

    # Warm up: JVM JIT + parquet footer cache, outside the measurement.
    REGISTRY["q01_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    names = [n for n in HEADLINE if n in REGISTRY]
    timings: dict[str, float] = {}
    for name in names:
        # min of 3 runs: the host is shared and back-to-back full-suite
        # totals have differed by 40% (99.9s vs 70.3s) — a single
        # sample, and often even two, catches external load spikes.
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        # Release plan/broadcast/shuffle references between queries so
        # the ContextCleaner reclaims them — measured cross-query JVM
        # degradation otherwise (30s queries that run in 2s clean).
        import gc

        gc.collect()
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    here = os.path.dirname(os.path.abspath(__file__))
    _regression_report(timings, here)
    _write_full_artifact(timings, total, sf, here)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
