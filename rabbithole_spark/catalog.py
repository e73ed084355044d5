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
)

#: Registry emission order. External harnesses verify a bounded
#: 50-query prefix of the registry per round, so queries needing
#: external verification go FIRST: (a) the round-3 verdict's named
#: verification debt (the 4 dsum-touched temporal queries that ceded
#: slots on a value-identity argument), (b) EVERY query whose
#: semantics this round's diff touches (the IVF deterministic
#: quantizer + new oracle, the quality_score empty-doc guard and its
#: users, the quantized-ANN rounding fix, the map-funcs oracle
#:coercion fix, the six bounded-stream oracle flips, the
#: shard-keyed sequence packing), then (c) the queries whose latest
#: external row is OLDEST (round 1), so no green row ages past two
#: rounds. Names absent from this list follow in registration order;
#: names listed but not registered are ignored.
_PRIORITY_ORDER = (
    # round-3 verdict item 1: the dsum-touched temporal queries whose
    # current code never got an external row
    "temporal_parts",
    "temporal_trunc_daily",
    "temporal_arithmetic",
    "window_tumbling_hourly",
    # modified in round 4: deterministic-quantizer IVF (new oracle),
    # the six bounded-stream oracle flips, shard-keyed packing
    "similarity_ann_ivf",
    "stream_tumbling_counts",
    "stream_session_window",
    "stream_static_enrich",
    "stream_dedup_watermark",
    "stream_dedup_within_watermark",
    "stream_stream_interval_join",
    "stream_stateful_running_totals",
    "pack_sequences_by_source",
    # modified in round 4: quality_score empty-doc guard users,
    # quantized-ANN query rounding, kmeans Lloyd refactor, map-funcs
    # oracle coercion
    "text_quality_stats",
    "source_quality_rollup",
    "pipeline_curation_full",
    "curriculum_phase_stats",
    "similarity_ann_quantized",
    "similarity_kmeans_clusters",
    "scalar_map_funcs",
    # modified in round 4: EVERY remaining dsum/sql_dsum user — the
    # exact-sum conversion switched from shared-ROUND to a single
    # correctly-rounded conversion per engine (functions/numeric.py;
    # value-identity at driver SFs, but the whole touched surface goes
    # inside the verified prefix this time, unlike round 3)
    "pricing_summary",
    "join_multiway_revenue",
    "join_range_quantity_bands",
    "agg_event_stats",
    "agg_rollup",
    "agg_conditional",
    "subquery_in",
    "tpch_q3_shipping_priority",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume",
    # new in round 4 (local parity green at sf0.001/0.01, several also
    # at 0.1) — need a first external row
    "split_train_val_test",
    "dedup_canonical_survivors",
    "pack_padding_efficiency",
    "mixture_temperature_weights",
    "dedup_jaccard_prefix_filter",
    "dedup_edit_distance_prefix",
    "text_segment_dedup_rate",
    "text_remove_boilerplate",
    "corpus_snapshot_diff",
    "sample_quality_weighted",
    "stream_stream_outer_join",
    "sql_recursive_gapfill_days",
    "join_lateral_topn",
    "udf_cogrouped_asof",
    # plan-only round-4 edits (localCheckpoint re-execution cuts) —
    # value-identity shown locally, still re-verified externally
    "funnel_conversion_stages",
    "text_tfidf_top_terms",
    # oldest external rows (latest green is round 1) — refreshed
    # oldest-first with the slots that remain; the deferred round-1
    # tail (setops, distribution/nulls/unpivot/json scalars,
    # subquery_scalar, and the 3 rows-only sketch queries whose
    # status cannot change) leads the round-5 refresh
    "join_inner_enriched_orders",
    "join_right_suppliers_nations",
    "join_full_outer_nation_counts",
    "join_semi_big_spenders",
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
