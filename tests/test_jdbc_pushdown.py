"""Real JDBC source/sink against the Derby engine BUNDLED with Spark
(pyspark ships derby*.jar for the Hive metastore, so no external
driver is needed after all — this closes the long-standing
'pushdown-verified JDBC needs a jar' gap in NOTES.md).

Covers the reference's SQL-database side (src/rabbithole/sql.py) with
Spark's native JDBC relation: batch write, read-back, FILTER PUSHDOWN
into the database (PushedFilters on the JDBC scan node), and a
partitioned parallel read (each executor slice issues its own bounded
query — the 100 TB ingest shape, one connection per partition)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from rabbithole_spark.session import table

_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_jdbc_roundtrip_pushdown_and_partitioned_read(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    src = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    n = src.count()

    # batch JDBC write (executors write partitions in parallel)
    (src.write.format("jdbc")
        .option("url", url).option("driver", _DRIVER)
        .option("dbtable", "orders_jdbc").mode("overwrite").save())

    # read back + filter pushdown: the predicate must reach the
    # database as part of the generated SQL, not run in Spark
    back = (spark.read.format("jdbc")
            .option("url", url).option("driver", _DRIVER)
            .option("dbtable", "orders_jdbc").load())
    assert back.count() == n
    q = back.filter(F.col("o_totalprice") > 100000).select(
        "o_orderkey", "o_totalprice"
    )
    plan = _plan(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("o_totalprice" in l for l in pushed), pushed
    want = src.filter(F.col("o_totalprice") > 100000).count()
    assert q.count() == want

    # partitioned parallel read: 4 bounded queries on the partition
    # column — the shape that scales a JDBC ingest across executors
    part = (spark.read.format("jdbc")
            .option("url", url).option("driver", _DRIVER)
            .option("dbtable", "orders_jdbc")
            .option("partitionColumn", "o_orderkey")
            .option("lowerBound", "1").option("upperBound", "6000")
            .option("numPartitions", "4").load())
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == n
    # no rows lost or duplicated across the partition bounds
    assert (
        part.agg(F.countDistinct("o_orderkey")).collect()[0][0]
        == src.agg(F.countDistinct("o_orderkey")).collect()[0][0]
    )
