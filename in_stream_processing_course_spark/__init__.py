"""PySpark-native analytics engine with the query surface of
modelflat/in-stream-processing-course (clickstream bot detection),
re-expressed Spark-first, plus LLM-data-pipeline extension operators
(dedup, similarity search, text analysis, multimodal columns).

Layout
------
- ``session``     SparkSession factory tuned for local[] testing and
                  cluster-scale defaults (AQE, Arrow, UTC).
- ``schemas``     Declared StructTypes (reference: Common.scala:52-87).
- ``functions``   Pure Column-algebra scalar functions (the bot
                  classifier, text metrics, vector math).
- ``operators``   Reusable DataFrame -> DataFrame transforms
                  (projections, windowed aggregations, dedup families,
                  similarity search).
- ``sources``     Batch/stream readers + synthetic workload generator
                  (reference: botgen.py, logs-to-kafka/).
- ``sinks``       foreachBatch keyed upsert with TTL / ifNotExists
                  semantics (reference: Cassandra/Ignite sinks).
- ``streaming``   Watermark/window wrappers, keyed state via
                  applyInPandasWithState, batch<->stream runners.
- ``plans``       Named query builders ``(spark, sf_dir) -> DataFrame``
                  registered in ``__spark_entry__`` with DuckDB oracles.

Every query builder is batch/stream agnostic: the same transform runs
on ``spark.read`` and ``spark.readStream`` inputs (the reference's
load-bearing design property, ImplStructured.scala:145-146).
"""

__version__ = "0.1.0"
