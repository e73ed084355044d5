"""Query/operator registry — the surface the driver's harness reads.

Every implemented operator from SURVEY.md §2B registers here with

- a Spark callable ``(spark, sf_dir) -> DataFrame``, and
- (when SQL-expressible) an equivalent DuckDB oracle SQL string.

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry. Column names are aliased identically on both sides: the driver
sorts columns by name before hashing values.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from rabbithole_spark.session import prepare

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Query modules whose import populates the registry.
_QUERY_MODULES = (
    "rabbithole_spark.queries.llm",
    "rabbithole_spark.queries.tpch",
    "rabbithole_spark.queries.tpch_derived",
    "rabbithole_spark.queries.temporal",
    "rabbithole_spark.queries.stats",
    "rabbithole_spark.queries.udfs",
    "rabbithole_spark.queries.pipeline",
    "rabbithole_spark.queries.core",
    "rabbithole_spark.queries.joins",
    "rabbithole_spark.queries.aggregates",
    "rabbithole_spark.queries.windows",
    "rabbithole_spark.queries.setops",
    "rabbithole_spark.queries.sortlimit",
    "rabbithole_spark.queries.scalars",
    "rabbithole_spark.queries.sqlsurface",
    "rabbithole_spark.queries.layout",
)

#: Registry emission order. External harnesses verify a bounded
#: 50-query prefix of the registry per round, so queries needing
#: external verification go FIRST. Recomputed at round 7 from the
#: union of CORRECTNESS_r01-r06 (each query's LATEST external row).
#: The 50-slot round-7 window is:
#: (a) slots 0-22, the 23 never-externally-checked queries: the 20
#: round-6 late additions (8 analytics shapes, the 6 derived-partsupp
#: TPC-H shapes Q2/Q9/Q11/Q12/Q16/Q20, SemDeDup, filtered top-k,
#: n-gram novelty, MAD outliers, OOV rate, incremental MinHash) plus
#: the 3 round-7 new operators (repeated-span coverage, vocab
#: coverage curve, fixed-k-per-source sampling) — each locally 3-SF
#: oracle-green before registration, per NOTES;
#: (b) slots 23-38, the 16-query staleness backlog oldest-first: the
#: 2 r1-latest rows, dedup_components (r2), and the 13 r3-latest rows
#: (similarity_ann_lsh, changed this round, also sits here);
#: (c) slots 39-46, the 8 queries whose code or oracle changed in
#: round 7 and therefore need a fresh external row: the minhash pair
#: (restructured signatures/banding), agg_approx_percentile (rows-only
#: -> deterministic oracle), and the kmeans/quantized/IVF/IVF-batch/
#: MMR malformed-vector exclusions;
#: (d) slots 47-49, the first 3 r4-latest rows alphabetical. The
#: remaining 47 r4 rows lead the round-8 window below the cut.
#: Staleness invariant (pinned in tests/test_catalog_invariants.py):
#: with a 50-slot window and this ordering discipline no oracle-backed
#: query's latest external row may trail the current round by more
#: than 4 rounds, and never-checked queries must form the order's
#: prefix. Names
#: absent from this list follow in registration order; names listed
#: but not registered are ignored.
_PRIORITY_ORDER = (
    "mixture_js_divergence_by_source",
    "text_collocation_pmi",
    "stream_stream_right_outer",
    "contamination_winnow_overlap",
    "text_lm_cross_entropy",
    "diagnostic_join_key_skew",
    "timeseries_user_profile_outliers",
    "cohort_weekly_retention",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q12_priority_lines",
    "tpch_q16_supplier_part_counts",
    "tpch_q20_excess_stock",
    "dedup_semantic_semdedup",
    "similarity_filtered_topk",
    "text_ngram_novelty",
    "stats_mad_outliers",
    "text_vocab_oov_rate",
    "dedup_minhash_incremental",
    "dedup_repeated_span_coverage",
    "text_vocab_coverage_curve",
    "sample_fixed_k_per_source",
    "window_range_frame",
    "window_rank_orders",
    "dedup_components",
    "dedup_incremental_new_docs",
    "sample_stratified_by_lang",
    "sample_uniform_documents",
    "scalar_try_arithmetic",
    "similarity_ann_lsh",
    "similarity_embedding_near_dup",
    "stream_count_or_time_batcher",
    "udf_grouped_zscore",
    "udf_pandas_vectorized",
    "udf_python_rowwise",
    "udf_udtf_lateral_split",
    "window_running_totals",
    "window_session_per_user",
    "dedup_minhash_lsh",
    "dedup_minhash_recall_audit",
    "agg_approx_percentile",
    "similarity_kmeans_clusters",
    "similarity_ann_quantized",
    "similarity_ann_ivf",
    "similarity_ann_ivf_batch",
    "similarity_mmr_rerank",
    "agg_conditional",
    "agg_event_stats",
    "agg_rollup",
    "corpus_snapshot_diff",
    "curriculum_phase_stats",
    "dedup_canonical_survivors",
    "dedup_edit_distance_prefix",
    "dedup_jaccard_prefix_filter",
    "funnel_conversion_stages",
    "join_inner_enriched_orders",
    "join_full_outer_nation_counts",
    "join_lateral_topn",
    "join_multiway_revenue",
    "join_range_quantity_bands",
    "join_right_suppliers_nations",
    "join_semi_big_spenders",
    "mixture_temperature_weights",
    "pack_padding_efficiency",
    "pack_sequences_by_source",
    "pipeline_curation_full",
    "pricing_summary",
    "sample_quality_weighted",
    "scalar_map_funcs",
    "source_quality_rollup",
    "split_train_val_test",
    "sql_recursive_gapfill_days",
    "stream_dedup_watermark",
    "stream_dedup_within_watermark",
    "stream_session_window",
    "stream_stateful_running_totals",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "stream_stream_outer_join",
    "stream_tumbling_counts",
    "subquery_in",
    "temporal_arithmetic",
    "temporal_parts",
    "temporal_trunc_daily",
    "text_quality_stats",
    "text_remove_boilerplate",
    "text_segment_dedup_rate",
    "text_tfidf_top_terms",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume",
    "tpch_q3_shipping_priority",
    "udf_cogrouped_asof",
    "window_tumbling_hourly",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL; None -> driver's rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a query; wraps the fn to pin session confs."""

    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir)

        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=wrapped, oracle=oracle, doc=doc)
        return wrapped

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (registration is an import side effect)."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Module not built yet (incremental rounds) — skip, don't break
            # the whole surface over one missing file.
            if exc.name and exc.name.startswith("rabbithole_spark"):
                continue
            raise
    ordered: dict[str, QuerySpec] = {}
    for name in _PRIORITY_ORDER:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        ordered.setdefault(name, spec)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle
    }
