"""Scalar-function surface (SURVEY.md §2B Scalar fns): string, math,
conditional, array (incl. higher-order), and JSON functions.

All expressions are JVM built-ins inside whole-stage codegen — no
Python UDFs in this module. Type alignment with the DuckDB oracle is
explicit (length/size are INT in Spark vs BIGINT in DuckDB, etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rabbithole_spark.catalog import register
from rabbithole_spark.session import table

_STRING_ORACLE = """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       CAST(length(p_name) AS INTEGER) AS name_len,
       substring(p_name, 1, 5) AS name_prefix,
       -- concat_ws, not concat: DuckDB concat() silently SKIPS NULL
       -- args while keeping neighbors ('Brand#23' || NULL -> the ':'
       -- separator survives), whereas Spark concat_ws skips the arg
       -- AND its separator. concat_ws has identical NULL-skipping
       -- semantics in both engines (NULL-probe pin, round 6).
       concat_ws(':', p_brand, p_type) AS brand_type,
       trim('  ' || p_name || ' ') AS name_trimmed,
       replace(p_name, ' ', '_') AS name_snake,
       reverse(p_type) AS type_reversed,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
       contains(p_name, 'widget') AS is_widget,
       starts_with(p_name, 'small') AS is_small
FROM part
"""


@register(
    "scalar_string_funcs",
    oracle=_STRING_ORACLE,
    doc="String functions: case, length, substring, concat, trim, "
    "replace, reverse, pad, regexp_extract, contains, starts_with. "
    "Reference analogue: dotted-path string handling sql.py:157-166.",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_type").alias("type_reversed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.contains(F.col("p_name"), F.lit("widget")).alias("is_widget"),
        F.startswith(F.col("p_name"), F.lit("small")).alias("is_small"),
    )


_MATH_ORACLE = """
SELECT p_partkey,
       round(p_retailprice, 1) AS price_rounded,
       abs(p_retailprice - 1000) AS price_dist_1000,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       round(sqrt(p_retailprice), 6) AS price_sqrt,
       round(ln(p_retailprice), 6) AS price_ln,
       CAST(p_size % 5 AS INTEGER) AS size_mod5,
       CAST(power(2, p_size % 5) AS DOUBLE) AS pow2,
       CAST(greatest(p_size, 20) AS INTEGER) AS size_floor20,
       CAST(least(p_size, 20) AS INTEGER) AS size_cap20,
       CAST(sign(p_retailprice - 1000) AS DOUBLE) AS above_1000
FROM part
"""


@register(
    "scalar_math_funcs",
    oracle=_MATH_ORACLE,
    doc="Math functions: round, abs, ceil/floor, sqrt, ln, mod, power, "
    "greatest/least, sign.",
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(price, 1).alias("price_rounded"),
        F.abs(price - 1000).alias("price_dist_1000"),
        F.ceil(price).cast("bigint").alias("price_ceil"),
        F.floor(price).cast("bigint").alias("price_floor"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.log(price), 6).alias("price_ln"),
        (F.col("p_size") % 5).cast("int").alias("size_mod5"),
        F.pow(F.lit(2), F.col("p_size") % 5).cast("double").alias("pow2"),
        F.greatest(F.col("p_size"), F.lit(20)).alias("size_floor20"),
        F.least(F.col("p_size"), F.lit(20)).alias("size_cap20"),
        F.signum(price - 1000).cast("double").alias("above_1000"),
    )


_COND_ORACLE = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS balance_band,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
       (c_acctbal BETWEEN 0 AND 1000) AS is_small_positive,
       (c_nationkey IN (1, 2, 3)) AS in_first_nations
FROM customer
"""


@register(
    "scalar_conditional",
    oracle=_COND_ORACLE,
    doc="CASE WHEN banding, coalesce/nullif, BETWEEN, IN predicates.",
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "low").otherwise("high").alias(
            "balance_band"
        ),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "segment_masked"
        ),
        bal.between(0, 1000).alias("is_small_positive"),
        F.col("c_nationkey").isin(1, 2, 3).alias("in_first_nations"),
    )


_ARRAY_ORACLE = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
       string_split(text, ' ')[1] AS first_word,
       list_contains(string_split(text, ' '), 'spark') AS mentions_spark,
       array_to_string(list_slice(string_split(text, ' '), 1, 3), ' ') AS first_three,
       list_sort(list_distinct(string_split(text, ' ')))[1] AS min_word
FROM documents
"""


@register(
    "scalar_array_funcs",
    oracle=_ARRAY_ORACLE,
    doc="Array functions over tokenized text: size, indexing, contains, "
    "slice, join, distinct+sort (SURVEY.md §2B Array).",
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).cast("int").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_contains(words, "spark").alias("mentions_spark"),
        F.array_join(F.slice(words, 1, 3), " ").alias("first_three"),
        F.element_at(F.array_sort(F.array_distinct(words)), 1).alias("min_word"),
    )


_HOF_ORACLE = """
SELECT vec_id,
       -- NULL-element guard (round-6 probe): Spark's aggregate fold
       -- propagates a NULL element into a NULL sum; DuckDB's
       -- list_aggregate('sum') silently SKIPS NULL elements. The
       -- coalesce pins the EMPTY-array case (round-9 review): Spark's
       -- fold returns its 0.0 seed over [], DuckDB's
       -- list_aggregate([], 'sum') is NULL.
       CASE WHEN len(list_filter(embedding, x -> x IS NULL)) = 0
            THEN coalesce(round(list_aggregate(list_transform(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 4),
                 0.0)
       END AS sq_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
       round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_component
FROM embeddings
"""


@register(
    "scalar_array_hof",
    oracle=_HOF_ORACLE,
    doc="Higher-order functions on array<float>: transform + aggregate "
    "(squared L2 norm), filter, max — the JVM-side vector-math path.",
)
def scalar_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.round(sq, 4).alias("sq_norm"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("int").alias(
            "n_positive"
        ),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_component"),
    )


#: Spark's string->int TRY_CAST semantics, replayed (round-9 review +
#: measurement): trims whitespace, accepts ONLY integral tokens
#: ('12.5', '1.0', 'true' -> NULL where DuckDB's bare TRY_CAST rounds
#: '12.5' to 13), int32 overflow -> NULL on both engines.
_SPARK_TRY_INT_SQL = (
    "CASE WHEN regexp_matches(trim({s}), '^[+-]?[0-9]+$') "
    "THEN TRY_CAST(trim({s}) AS INTEGER) END"
)

_JSON_ORACLE = f"""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       {_SPARK_TRY_INT_SQL.format(s="json_extract_string(props, '$.k')")}
           AS k_int,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_key
FROM events
"""


@register(
    "scalar_json_funcs",
    oracle=_JSON_ORACLE,
    doc="JSON dotted-path extraction with missing->NULL semantics "
    "(reference parity: sql.py:157-163, SURVEY.md §2C.1). k_int uses "
    "try_cast (round-9 review): under Spark 4's default ANSI mode a "
    "plain cast of one non-integral token ('12.5') would kill the "
    "whole job — the scalar_try_arithmetic one-poisoned-row policy "
    "applies to casts too. Edge-token parity with the oracle is "
    "pinned by tests/test_map_semantics.py.",
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


#: try_variant_get(v, '$.k', 'int'), replayed per json_type (round-9
#: review + measurement): BIGINT in int32 range -> value (overflow ->
#: NULL); DOUBLE -> truncation TOWARD ZERO (12.5 -> 12, -12.5 -> -12,
#: 13.7 -> 13; out-of-range -> NULL); BOOLEAN -> 1/0; VARCHAR -> the
#: Spark string->int try_cast (integral tokens only — a QUOTED "12.5"
#: is NULL where a bare 12.5 truncates); ARRAY/OBJECT/NULL -> NULL.
_VARIANT_INT_SQL = (
    "CASE json_type(json_extract(props, '$.k')) "
    "WHEN 'BOOLEAN' THEN "
    "  CASE WHEN json_extract_string(props, '$.k') = 'true' THEN 1 ELSE 0 END "
    "WHEN 'DOUBLE' THEN "
    "  CASE WHEN trunc(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) "
    "            BETWEEN -2147483648 AND 2147483647 "
    "       THEN CAST(trunc(TRY_CAST(json_extract_string(props, '$.k') "
    "                 AS DOUBLE)) AS INTEGER) END "
    "WHEN 'BIGINT' THEN "
    "  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) "
    "WHEN 'UBIGINT' THEN "
    "  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) "
    "WHEN 'VARCHAR' THEN "
    + _SPARK_TRY_INT_SQL.format(s="json_extract_string(props, '$.k')")
    + " END"
)

_VARIANT_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       ROUND(AVG({_VARIANT_INT_SQL}), 6) AS avg_k,
       CAST(count(json_extract_string(props, '$.missing')) AS BIGINT)
           AS n_missing
FROM events
GROUP BY event_type
"""


@register(
    "scalar_variant_json",
    oracle=_VARIANT_ORACLE,
    doc="Schema-less JSON via Spark 4 VARIANT (parse_json + "
    "variant_get): the engine's modern mapping of the reference's "
    "dynamic payload model (SURVEY.md §1.2) — one binary-encoded "
    "parse per row instead of a re-parse per extracted path, typed "
    "extraction at use sites, missing paths -> NULL "
    "(try_variant_get; sql.py:159-163 parity). Aggregates the "
    "extracted value to prove the typed path feeds JVM-side "
    "aggregation directly.",
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_type",
            F.try_variant_get(v, "$.k", "int").alias("k"),
            F.try_variant_get(v, "$.missing", "string").alias("missing"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.count("missing").alias("n_missing"),
        )
    )


# Coercion mirrors Spark's from_json(Map<String,Integer>) PERMISSIVE
# semantics, measured: ONE value that is not a JSON integer token in
# int32 range nulls the ENTIRE map — fractional (12.5), quoted ("5"),
# boolean, and out-of-range integers all trip it; a JSON null value is
# fine (the map keeps the key with a NULL value). The gate uses
# json_type, which sees the raw token kind (json_extract_string would
# strip the quotes off "5" and wrongly admit it), plus a TRY_CAST
# range check that can never make the oracle itself raise.
_MAP_ORACLE = """
WITH checked AS (
  SELECT event_id, props,
         len(list_filter(json_keys(props), kk ->
             NOT (json_type(json_extract(props, '$.' || kk)) IS NULL
                  -- a JSON null VALUE is parseable: from_json maps it
                  -- to a NULL map entry (round-6 NULL-fixture pin)
                  OR json_type(json_extract(props, '$.' || kk)) = 'NULL'
                  OR (json_type(json_extract(props, '$.' || kk))
                          IN ('UBIGINT', 'BIGINT')
                      AND TRY_CAST(json_extract_string(props, '$.' || kk)
                                   AS BIGINT)
                          BETWEEN -2147483648 AND 2147483647)))) = 0 AS ok
  FROM events
)
SELECT event_id,
       -- coalesce('') twice: Spark's array_join renders an empty or
       -- all-NULL array as '', DuckDB's array_to_string can yield
       -- NULL there (same pin)
       CASE WHEN ok
            THEN coalesce(array_to_string(list_sort(json_keys(props)),
                                          ','), '') END
         AS prop_keys,
       CASE WHEN ok
            THEN coalesce(array_to_string(
                   list_transform(list_sort(json_keys(props)),
                     kk -> CAST(TRY_CAST(json_extract_string(props, '$.' || kk)
                                         AS BIGINT) AS VARCHAR)),
                   ','), '') END
         AS prop_values,
       CASE WHEN ok THEN CAST(len(json_keys(props)) AS INTEGER) END AS n_props,
       CASE WHEN ok
            THEN CAST(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                      AS INTEGER) END
         AS k_value
FROM checked
"""


@register(
    "scalar_map_funcs",
    oracle=_MAP_ORACLE,
    doc="Typed JSON ingest to MapType (from_json) + map functions: "
    "map_keys/map_values/size/element_at — the schemaless-payload "
    "fallback of the data model (SURVEY.md §1.2).",
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import IntegerType, MapType, StringType

    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", MapType(StringType(), IntegerType()))
    # Map iteration order differs between engines, so render keys sorted
    # and values in sorted-key order as joined strings: deterministic,
    # hashable cells on both sides (driver's pandas sort chokes on raw
    # array cells).
    sorted_keys = F.array_sort(F.map_keys(m))
    return ev.select(
        "event_id",
        F.array_join(sorted_keys, ",").alias("prop_keys"),
        F.array_join(
            F.transform(sorted_keys, lambda k: F.element_at(m, k).cast("string")),
            ",",
        ).alias("prop_values"),
        F.size(F.map_keys(m)).alias("n_props"),
        F.element_at(m, "k").alias("k_value"),
    )


_NULLSEM_ORACLE = """
SELECT event_id,
       nullif(event_type, 'click') AS type_or_null,
       coalesce(nullif(event_type, 'click'), 'CLICKED') AS filled,
       (nullif(event_type, 'click') IS NOT DISTINCT FROM nullif(event_type, 'click')) AS self_eq,
       (nullif(event_type, 'click') IS NOT DISTINCT FROM 'error') AS is_error_nullsafe,
       CASE WHEN value IS NULL THEN -1.0 ELSE round(value, 2) END AS value_or_sentinel
FROM events
"""


@register(
    "scalar_null_semantics",
    oracle=_NULLSEM_ORACLE,
    doc="NULL semantics parity: nullif/coalesce and null-safe equality "
    "(Spark <=> / eqNullSafe vs IS NOT DISTINCT FROM) — the three-"
    "valued-logic corners engines disagree on most.",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    type_or_null = F.nullif(F.col("event_type"), F.lit("click"))
    return ev.select(
        "event_id",
        type_or_null.alias("type_or_null"),
        F.coalesce(type_or_null, F.lit("CLICKED")).alias("filled"),
        type_or_null.eqNullSafe(type_or_null).alias("self_eq"),
        type_or_null.eqNullSafe(F.lit("error")).alias("is_error_nullsafe"),
        F.when(F.col("value").isNull(), F.lit(-1.0))
        .otherwise(F.round("value", 2))
        .alias("value_or_sentinel"),
    )


_TRY_ARITH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice / nullif(l_discount, 0.0) AS price_per_discount,
       CASE WHEN l_quantity = 0 THEN NULL
            ELSE CAST(floor(l_extendedprice / l_quantity) AS BIGINT)
       END AS unit_price_floor
FROM lineitem
WHERE l_orderkey <= 64
"""


@register(
    "scalar_try_arithmetic",
    oracle=_TRY_ARITH_ORACLE,
    doc="Error-safe arithmetic: try_divide maps divide-by-zero to NULL "
    "instead of failing the job or silently yielding Inf — on a "
    "100 TB run one poisoned row must not kill a 6-hour query. "
    "Matches the SQL NULLIF/CASE guards the oracle uses.",
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 64)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # try_divide alone maps a zero divisor to NULL — a nullif
        # wrapper here is dead weight (round-9 review, measured)
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "price_per_discount"
        ),
        F.floor(
            F.try_divide(F.col("l_extendedprice"), F.col("l_quantity"))
        ).cast("bigint").alias("unit_price_floor"),
    )
