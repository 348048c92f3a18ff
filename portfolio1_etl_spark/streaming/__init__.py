"""Structured Streaming surface (SURVEY.md §2.11)."""

from portfolio1_etl_spark.streaming.jobs import (
    aggview_maintenance_stream,
    distinctview_maintenance_stream,
    bloom_maintenance_stream,
    cms_maintenance_stream,
    corpus_prep_finalize,
    corpus_prep_stream,
    dedup_events_stream,
    paired_events_stream,
    inventory_merge_stream,
    joinview_maintenance_stream,
    read_events_stream,
    running_user_totals_stream,
    scd2_maintenance_stream,
    sessionized_stream,
    versioned_cdc_stream,
    windowed_counts_stream,
)

__all__ = [
    "read_events_stream",
    "windowed_counts_stream",
    "sessionized_stream",
    "dedup_events_stream",
    "paired_events_stream",
    "inventory_merge_stream",
    "running_user_totals_stream",
    "scd2_maintenance_stream",
    "bloom_maintenance_stream",
    "cms_maintenance_stream",
    "corpus_prep_stream",
    "corpus_prep_finalize",
    "versioned_cdc_stream",
    "joinview_maintenance_stream",
    "aggview_maintenance_stream",
    "distinctview_maintenance_stream",
]
