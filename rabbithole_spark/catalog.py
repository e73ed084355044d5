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
#: semantics-touched in round 6 — nine new queries (stream-stream
#: left-semi join, salted skew join, MMR re-rank, streaming sliding
#: window, duplicated-ngram-span dedup, TPC-H Q6/Q14 shapes, range
#: similarity search, Flesch readability) plus
#: dedup_minhash_lsh,
#: dedup_simhash and agg_approx_count_distinct, which flipped from
#: rows-only to FULL-replay oracles (functions/xxh64_sql.py replays
#: Spark's xxhash64 bit-exactly — string path for the MinHash/SimHash
#: signature+banding pipelines, long path for the HLL++ registers) — then (b) the staleness backlog
#: computed from CORRECTNESS_r01-r04 + the round-5 window,
#: oldest-first: the 1 remaining r1-latest row (agg_hll_sketch_union,
#: which ceded its round-5 slot), all 22 other r2-latest rows, and
#: the alphabetically-first r3-latest rows up to the 50-slot budget.
#: Each round-6 new query displaced one r3 tail slot; the deferred r3
#: remainder (sample_stratified_by_lang, sample_uniform_documents,
#: scalar_try_arithmetic,
#: similarity_ann_lsh,
#: similarity_embedding_near_dup,
#: stream_count_or_time_batcher, the three udf_* rows,
#: window_running_totals, window_session_per_user) leads the round-7
#: refresh. After this round no query's latest external row predates
#: round 3. Names absent from this list follow in registration
#: order; names listed but not registered are ignored.
_PRIORITY_ORDER = (
    # -- (a) new/touched in round 6 (each entry displaced one r3 tail
    # slot into the round-7 deferred list above)
    "stream_stream_left_semi",
    "join_salted_skew",
    "similarity_mmr_rerank",
    "stream_sliding_counts",
    "dedup_duplicate_ngram_spans",
    "tpch_q6_revenue_delta",
    "tpch_q14_promo_share",
    "similarity_range_search",
    "text_readability_scores",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "agg_approx_count_distinct",  # oracle flipped r6: HLL++ replay
    # -- (b) staleness backlog: the r1 survivor, then r2-latest
    "agg_hll_sketch_union",
    "agg_corr_regression",
    "agg_percentiles",
    "agg_stats_moments",
    "contamination_ngram_overlap",
    "dedup_exact_documents",
    "dedup_fingerprint",
    "embedding_centroids",
    "mixture_resample_by_lang",
    "multimodal_binary_stats",
    "pii_redaction",
    "pipeline_clean_corpus",
    "similarity_topk_bruteforce",
    "temporal_calendar_funcs",
    "text_bm25_ranking",
    "text_chunk_documents",
    "text_lang_id",
    "text_pii_scrub",
    "text_repetition_filter",
    "text_token_counts",
    "text_top_ngrams",
    "tpch_q4_exists_shape",
    "window_sliding_hourly",
    # -- (b) r3-latest, alphabetical up to the 50-slot budget
    "agg_approx_percentile",
    "agg_bool_countif",
    "agg_grouping_sets",
    "agg_minmax_by",
    "agg_string_collect",
    "agg_theta_sketch_setops",
    "join_attribution_clicks",
    "join_left_customer_orders",
    "lateral_posexplode_words",
    "mixture_token_budget",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "multimodal_resize_pipeline",
    "pipeline_param_mapping",
    "profile_orders_columns",
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
