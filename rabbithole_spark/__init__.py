"""rabbithole-spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jcollado/rabbithole (reference analyzed in
SURVEY.md), re-expressed Spark-first.

The engine surface:

- ``rabbithole_spark.session``   — SparkSession factory + parquet table registry
- ``rabbithole_spark.catalog``   — the query/operator registry the driver reads
- ``rabbithole_spark.operators`` — reusable distributed operators (joins, top-k,
  as-of, dedup, similarity, sessionize, ...)
- ``rabbithole_spark.functions`` — column-level helpers (dotted-path JSON
  extraction with reference semantics, text analytics, vector math)
- ``rabbithole_spark.plans``     — YAML pipeline spec -> compiled Spark pipeline
  (the reference's config surface, SURVEY.md §1.3)
- ``rabbithole_spark.streaming`` — structured-streaming parity: count-or-time
  micro-batching, foreachBatch SQL sink with the reference's error policy,
  dead-letter split, AMQP-shaped Python DataSource
"""

__version__ = "0.1.0"
