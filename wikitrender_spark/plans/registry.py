"""Central registry: query name -> (spark callable, optional DuckDB oracle).

__spark_entry__.queries()/oracle_sql() are thin views over this. Modules
contribute (QUERIES, ORACLES) dict pairs; names must be unique.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(queries: dict[str, QueryFn], oracles: dict[str, str]) -> None:
    for name in queries:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
    _QUERIES.update(queries)
    _ORACLES.update(oracles)


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_loaded = False


def _load() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    # strict imports: a broken module must fail loudly here, not silently
    # shrink the query set the driver sees
    from . import pipeline_queries, relational_queries, wikitrender_queries

    # Registration order is load-bearing: the driver's correctness gate
    # checks the FIRST 50 registered queries. wikitrender (14) + pipeline
    # (21) + the first 15 relational rows = exactly 50; everything past
    # the cutoff (the back of the rel dict plus the *_ROTATED dicts) is a
    # long-green rotation candidate (hash-green in both r01 and r02),
    # deliberately ordered last — see the QUERIES dict comments in
    # relational_queries.py / pipeline_queries.py.
    register(wikitrender_queries.QUERIES, wikitrender_queries.ORACLES)
    register(pipeline_queries.QUERIES, pipeline_queries.ORACLES)
    register(relational_queries.QUERIES, relational_queries.ORACLES)
    register(pipeline_queries.QUERIES_ROTATED, pipeline_queries.ORACLES_ROTATED)
