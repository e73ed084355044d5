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
#: external verification go FIRST. Recomputed at round 6 from the
#: union of CORRECTNESS_r01-r05 (each query's LATEST external row):
#: (a) the 19 never-externally-checked queries — the 10 round-5
#: additions (each locally oracle-verified at sf0.001/0.01/0.1
#: before registration, per NOTES), the 8 TPC-H shapes added in
#: round 6 (Q7/Q8/Q13/Q15/Q17/Q19/Q21/Q22), and the round-6
#: full-outer stream-stream join (likewise locally 3-SF green);
#: then (b) the
#: staleness backlog oldest-first (19 + 31 = the 50-slot window):
#: 31 of the 33 r1-latest rows in
#: alphabetical order (scalar/setop/window/agg families checked in
#: round 1 and never since — the largest debt in the registry). The
#: 50-slot budget cuts after window_lag_lead; the deferred remainder
#: (window_range_frame, window_rank_orders, dedup_components [r2],
#: and the 13 r3-latest rows) is listed below the cut so it
#: automatically leads the round-7 window if this order is kept. After round 6, no query's latest external row
#: predates round 1's survivors by more than one window. Names
#: absent from this list follow in registration order; names listed
#: but not registered are ignored.
_PRIORITY_ORDER = (
    # -- (a) never externally checked: round-5 additions first
    "sketch_tolerance_audit",
    "dedup_minhash_recall_audit",
    "text_winnow_fingerprints",
    "layout_zorder_clustering",
    "similarity_ann_ivf_batch",
    "dedup_edit_distance_prefix_sparse",
    "shard_shuffle_assignment",
    "source_overlap_matrix",
    "stream_ingest_dedup_against_corpus",
    "stream_count_or_time_sizes",
    # -- (a) never externally checked: round-6 TPC-H shapes
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q19_disjunctive_pushdown",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    # -- (a) never externally checked: round-6 full-outer stream join
    "stream_stream_full_outer",
    # -- (b) r1-latest backlog, alphabetical (31 of 33 fit the window)
    "agg_cube",
    "agg_distinct_pairs",
    "agg_having",
    "agg_kll_quantile_sketch",
    "agg_median_iqr",
    "join_anti_no_big_order",
    "join_asof_events",
    "join_cross_region_nation",
    "pivot_event_counts",
    "scalar_array_funcs",
    "scalar_array_hof",
    "scalar_conditional",
    "scalar_json_funcs",
    "scalar_math_funcs",
    "scalar_null_semantics",
    "scalar_string_funcs",
    "scalar_variant_json",
    "setop_except",
    "setop_except_all",
    "setop_intersect",
    "setop_intersect_all",
    "setop_union_all",
    "setop_union_distinct",
    "sort_limit_top_orders",
    "sort_nulls_first",
    "subquery_correlated",
    "subquery_scalar",
    "topk_per_group",
    "unpivot_customer_metrics",
    "window_distribution",
    "window_lag_lead",
    # ---- 50-slot window cut (the names below lead round 7) ----
    # round-6 late additions, locally 3-SF green, queued for their
    # first external row ahead of the remaining staleness backlog
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
