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
# for round 4 (r3 verdict "Next round" #1/#2):
#  1. queries NEW this round (no driver row can exist yet);
#  2. the one red r3 row (corpus_mixture_stats, oracle cast fixed);
#  3. the 25 queries outside the r3 window — their newest driver row is
#     r2, and five of them (lake_*) sit on lake/table.py which was
#     rewritten in r3 AFTER that check;
#  4. remaining slots fill with r3-green queries in registration order.
# Unknown names are ignored, so this list may lead the code it gates.
_PRIORITY: list[str] = [
    # -- new in round 4 --
    "lake_compact_endstate",
    "dedup_paragraphs",
    "dedup_paragraph_strip",
    "corpus_split_leakage_safe",
    "corpus_importance_sample",
    "sim_quantize_int8",
    "sim_cosine_topk_int8",
    "corpus_mixture_temperature",
    "text_bigram_collocations",
    "corpus_resample_boost",
    "j_range_join",
    "a10_funnel_steps",
    "sketch_kmv_distinct",
    "sketch_kmv_jaccard",
    "lake_schema_evolution",
    "lake_time_travel",
    "lake_restore_endstate",
    "corpus_profile_columns",
    "a11_cohort_retention",
    # -- r3 red row, oracle CAST fixed this round --
    "corpus_mixture_stats",
    # -- stale lake_* (substrate rewritten in r3 after last driver row) --
    "lake_global_index_move",
    "lake_mor_upsert_snapshot",
    "lake_insert_append",
    "lake_record_index_move",
    "lake_cdc_changes",
    # -- rest of the r3 tail (newest driver row is r2) --
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprints",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "curate_corpus",
    "dedup_semantic_keep",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "corpus_hash_sample",
    "corpus_vocab_topk",
    "corpus_pack_sequences",
    "mm_decode_features",
    "mm_frame_sample",
    "corpus_domain_quota",
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
