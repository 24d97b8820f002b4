"""Query registry consumed by __spark_entry__ (the driver contract).

Import side effects register every query module's entries into QUERIES.
"""

from cdc_apache_cassandra_spark.plans.registry import QUERIES, Query, register

# registration side effects
from cdc_apache_cassandra_spark.plans import cdc_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import cdc_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import tpch_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import tpch_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import relational_extra_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_sampling_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import events_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import events_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import fuzzy_dedup_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import multimodal_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import analytics_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_text_stats_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import cdc_time_travel_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import vector_deep_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import analytics_extra_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import profile_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import function_gallery_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import extra_surface_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import kmeans_srp_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_substring_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_bpe_queries  # noqa: E402,F401
from cdc_apache_cassandra_spark.plans import llm_pii_queries  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver-gate roster (VERDICT r8 item 3 + ADVICE r8): the driver's
# correctness gate samples the FIRST 50 registry entries, so ordering IS
# the gate roster. Rather than encoding membership in fragile swap
# pairs over import-time dict order, the roster is an explicit list of
# exactly 50 names; the reorder moves them to the front (preserving the
# roster's order), with everything else following in registration
# order. A missing name must not brick every import of the package —
# the roster is a gate preference, not a correctness invariant; the
# full oracle sweep covers all queries — so the reorder skips unknown
# names and tests/test_gate_roster.py is what fails loudly on a typo
# or rename.
#
# r9 rotation vs r8: multimodal_bmp_decode moves from position 51 into
# the window (the r8 off-by-one), llm_substring_span_dedup and
# multimodal_wav_frames rotate in; tpch_q10_returned_items (O4 also
# anchored by window_topk_orders_per_customer), setop_nations_with_both
# and agg_distinct_customers_per_status rotate out to the judge-sweep.
# r9 mid-round: cdc_delta_dv_import (deletion vectors + name-mode
# column mapping through read_delta, r8 verdict items 1+2) rotates in
# for tpch_q6_forecast_revenue (a filter-agg judge-sweep-green since
# r1, its shape also anchored by tpch_q1).
# r10 rotation (VERDICT r9 item 3): in — llm_ann_ivf_incremental,
# llm_ann_ivf_index_update, llm_decontamination_semantic,
# multimodal_image_dhash_hamming (the four r9-new entries),
# cql_collection_marshalling (clears its stale r01 `err` record — its
# only driver row ever, from a since-fixed harness canonicalization
# crash), multimodal_webdataset_shard (shards family never
# driver-checked); out — six stable multi-covered entries:
# tpch_q3_shipping_priority, tpch_q5_local_supplier_volume,
# cdc_token_routing (the murmur3 twin stays),
# cdc_compound_changes_between, cdc_pk_only_table,
# cdc_schema_evolution_union.
# r10 mid-round: cdc_delta_v2_checkpoint_import (V2 checkpoint read,
# r9 item 4) rotates in for agg_rollup_returnflag_status (a stable
# relational shape, judge-sweep-green since r2, grouping-set family
# also anchored by the sweep); cdc_delta_export_dv_state (writer-side
# deletion vectors, r9 item 6) rotates in for
# join_anti_customers_without_orders (the semi-join twin stays);
# cdc_delta_partitioned_import (foreign partitioned-table import — the
# silent-nulls gap found and fixed in r10) rotates in for
# cdc_out_of_order_stats (W3 stays anchored by cdc_lww_state).
# r11 rotation (VERDICT r10 item 2, never-checked-first policy): in —
# EIGHT never-driver-checked events_* entries (the largest unchecked
# family: 26 entries, 0 driver rows across 10 rounds) spanning its
# distinct shapes — events_tumbling_hourly (windowed agg),
# events_sessionize_30m (gap sessionization), events_asof_click_
# attribution (as-of join), events_cohort_retention (cohort matrix),
# events_funnel_signup_click_purchase (ordered funnel),
# events_heavy_hitters (approx top-k), events_anomaly_zscore (rolling
# stats), events_locf_gap_fill (imputation window) — plus the r11-new
# cdc_delta_mapped_export_state (name-mode mapped export writer,
# VERDICT r10 item 5). Out — nine 9-to-10-times-driver-green entries
# whose operator anchors keep a roster twin: cdc_dedup_events (A1/A3
# twin cdc_dedup_events_tws stays), cdc_lww_state (W3/O1 anchored by
# cdc_compound_lww_state), cdc_read_after_event (J1 by
# cdc_compound_read_after_event), cdc_replica_divergence (T1 by the
# dedup pair), cdc_materialized_state (S6/state oracle shared by the
# staying export-state entries), cdc_compound_snapshot_asof
# (time-travel family judge-sweep-green), cdc_compound_key_records
# (P4/P7/P8 anchored by cdc_null_leading_snapshot +
# cdc_compound_read_after_event), cdc_replication_latency (A6/W2
# judge-sweep), join_semi_orders_with_late_items (semi-join
# judge-sweep-green since r1).
# r11 mid-round: cdc_delta_cdf_table_changes (spec-exact CDF from cdc
# actions — delta-spark's table_changes surface, new this round)
# rotates in for cdc_udt_evolution_union (7 driver-green rows; UDT
# schema evolution also pinned by the schema_evolution pytest family
# and judge-sweep-green since r1); cdc_delta_cdf_stream (the
# readChangeFeed STREAM mode — change-data files consumed per version
# through the shared batch planner, new this round) rotates in for
# cdc_delta_change_feed (8-times-driver-green; its exact oracle SQL
# stays in-roster via its two twins cdc_delta_change_feed_stream and
# cdc_change_feed_range_split); cdc_delta_export_cdf (the export as a
# CDF WRITER — stored change-data files pinned against the pk-diff
# classification through the same oracle, new this round) rotates in
# for cdc_point_read_routing (9-times-driver-green; its §2 anchors
# S6/O2 stay in-roster via its twin cdc_store_point_read);
# cdc_delta_restore (RESTORE TABLE TO VERSION AS OF — one-commit
# rewind with memo/CDF composition, new this round) rotates in for
# cdc_compound_materialized_state (multi-green; the compound store's
# state oracle stays in-roster via cdc_compound_delta_export_state
# and cdc_compound_streaming_end_to_end, which exercise the same
# merge machinery end to end); cdc_delta_clone (SHALLOW CLONE — new
# this round) REPLACES cdc_delta_export_state: it builds the very
# same two-commit export, clones it, and reads back through the
# clone's log against the same oracle — a strict coverage superset
# in the same slot.
# ---------------------------------------------------------------------------
GATE_ROSTER = [
    "cdc_backfill_union",
    "cdc_delta_cdf_table_changes",
    "cdc_delta_partitioned_import",
    "cdc_delta_export_cdf",
    "cdc_store_point_read",
    "cdc_delta_clone",
    "cdc_delta_mapped_export_state",
    "cdc_remote_store_lifecycle",
    "cdc_streaming_end_to_end",
    "cdc_delta_checkpoint_state",
    "cdc_delta_cdf_stream",
    "cdc_delta_change_feed_stream",
    "cdc_change_feed_range_split",
    "cdc_wire_avro_roundtrip",
    "cdc_partition_classifier",
    "cdc_compound_lww_state",
    "cdc_compound_read_after_event",
    "cdc_null_leading_snapshot",
    "cdc_token_routing_murmur3",
    "cdc_delta_restore",
    "cdc_compound_delta_export_state",
    "cdc_compound_streaming_end_to_end",
    "cdc_backfill_token_splits",
    "cdc_dedup_events_tws",
    "tpch_q1_pricing_summary",
    "cdc_delta_dv_import",
    "cql_collection_marshalling",
    "llm_ann_ivf_incremental",
    "llm_ann_ivf_index_update",
    "llm_decontamination_semantic",
    "multimodal_image_dhash_hamming",
    "multimodal_webdataset_shard",
    "cdc_delta_export_dv_state",
    "window_topk_orders_per_customer",
    "cdc_delta_v2_checkpoint_import",
    "llm_substring_span_dedup",
    "multimodal_wav_frames",
    "llm_semdedup",
    "llm_dedup_ngram_jaccard",
    "llm_ann_ivf_kmeans_recall",
    "llm_bpe_train_merges",
    "multimodal_bmp_decode",
    "events_tumbling_hourly",
    "events_sessionize_30m",
    "events_asof_click_attribution",
    "events_cohort_retention",
    "events_funnel_signup_click_purchase",
    "events_heavy_hitters",
    "events_anomaly_zscore",
    "events_locf_gap_fill",
]


def _apply_gate_roster(roster) -> None:
    front = [n for n in roster if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    reordered = {n: QUERIES[n] for n in front + rest}
    QUERIES.clear()
    QUERIES.update(reordered)


_apply_gate_roster(GATE_ROSTER)
