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
#: external verification go FIRST: (a) every query added or
#: semantics-touched in round 5 (ten new queries — winnowing
#: fingerprints, z-order layout audit, sketch-tolerance audit,
#: MinHash-LSH recall audit, batch IVF, batcher-sizes twin, sparse
#: Ed-Join, shard shuffle, source
#: overlap, streaming ingest dedup — plus the coalesce-hash NULL
#: guards; dedup_components/_canonical_survivors switching to
#: prefix-filtered pairs; the outer-join oracle's measured eviction
#: boundary; the IVF ensure-index generation pinning), then (b) the
#: round-4 verdict's named staleness backlog — ALL 35 queries whose
#: latest external row was round 1 (32 hash-green + the 3 rows-only
#: sketches). The three late new queries took the last three slots
#: (previously the oldest r2 rows: minhash/simhash/corr — they lead
#: the round-6 refresh instead). Exactly 50 names: after this round
#: no query's latest external row predates round 2.
#: Names absent from this list follow in registration order; names
#: listed but not registered are ignored.
_PRIORITY_ORDER = (
    # -- (a) new in round 5: first external row needed
    "text_winnow_fingerprints",
    "layout_zorder_clustering",
    "sketch_tolerance_audit",
    "similarity_ann_ivf_batch",
    "stream_count_or_time_sizes",
    "dedup_edit_distance_prefix_sparse",
    "source_overlap_matrix",
    "shard_shuffle_assignment",
    "stream_ingest_dedup_against_corpus",
    "dedup_minhash_recall_audit",
    # -- (a) semantics touched in round 5
    "corpus_snapshot_diff",        # coalesce(text,'') digest NULL guard
    "dedup_incremental_new_docs",  # same NULL guard
    "dedup_components",            # pairs now prefix-filtered corpus-wide
    "dedup_canonical_survivors",   # same pair-source switch
    "stream_stream_outer_join",    # oracle: measured eviction boundary
    "similarity_ann_ivf",          # ensure-index generation pinning
    # -- (b) the round-1 staleness backlog, drained in full
    "agg_cube",
    "agg_distinct_pairs",
    "agg_having",
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
    "window_range_frame",
    "window_rank_orders",
    "agg_approx_count_distinct",   # rows-only sketch, last executed r1
    "agg_kll_quantile_sketch",     # rows-only sketch, last executed r1
    # agg_hll_sketch_union ceded its refresh slot to
    # dedup_minhash_recall_audit: its exact computation shape
    # (per-group hll_sketch_agg -> hll_union_agg -> estimate) is
    # hash-verified in-window by sketch_tolerance_audit, so the
    # rows-only execution refresh was strictly dominated. It leads
    # the round-6 window with minhash/simhash/corr.
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
