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

#: Query modules whose import populates the registry. Order matters to
#: external harnesses that check a bounded prefix of the registry per
#: round: modules whose queries have never received an external
#: correctness row go FIRST, already-verified modules last.
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
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle
    }
