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
- ``sources``    SSE streaming DataSource + file-replay helpers
- ``streaming``  keyed stateful processor (purge policy, rename protocol)
"""

__version__ = "0.1.0"
