"""wikitrender_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jdlrobson/wikitrender, re-expressed
Spark-first (DataFrame / SQL / Structured Streaming), plus the
large-scale-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) a 100 TB training-data pipeline needs.

Layout
------
- ``schemas``    pinned StructTypes (rc_event, page_state, testdata tables)
- ``session``    SparkSession builder with scale-appropriate defaults
- ``functions``  pure Column-expression libraries (classify, metrics, text,
                 similarity) — zero Python UDFs in the reference-parity path
- ``operators``  DataFrame -> DataFrame operators (derive, page_state,
                 lifecycle, topk, dedup, ann, multimodal)
- ``plans``      relational query plans over the TPC-H-ish star schema
- ``sources``    SSE streaming DataSource + file-replay helpers + sinks
- ``streaming``  keyed stateful processors (purge policy, rename protocol),
                 windowed/session aggs, stream-stream joins, telemetry
- ``engine``     ``WikiTrenderCollection`` — the reference-API facade

Quick start (the reference consumer's workflow)::

    from wikitrender_spark.engine import WikiTrenderCollection
    from wikitrender_spark.session import get_spark

    spark = get_spark()
    c = WikiTrenderCollection(spark, "/tmp/wt", sf_dir="/root/testdata/sf0.001")
    c.on_edit(lambda row: print(row["id"]))
    c.process_available()
    c.pages().show()
"""

__version__ = "0.1.0"
