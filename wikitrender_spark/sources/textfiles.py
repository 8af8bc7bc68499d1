"""Batch text-format connectors (JSON Lines / CSV) with PINNED schemas.

Training-data pipelines exchange corpora as JSONL shards at least as
often as parquet; these readers/writers make that a first-class,
schema-safe path. Reference analogue: none (the reference's only source
is the SSE stream, `index.js:295-305`) — this is part of the
BASELINE.json LLM-pipeline mandate.

Design pins (the 100 TB arguments):
- NO schema inference, ever: an inferred schema costs an extra full
  scan of the data and can drift between runs or partitions. Callers
  pass an explicit schema; mismatches fail loudly (FAILFAST) instead
  of silently nulling columns (PERMISSIVE's default failure mode).
- Writers emit one file per partition (the parallel write path);
  repartition BEFORE writing to control shard count, never coalesce(1).
- CSV cannot carry nested types; write_csv rejects array/map/struct
  columns loudly instead of letting Spark serialize garbage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as JSON Lines (one object per row, newline-delimited) —
    Spark's json writer is already JSONL-shaped."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read JSONL with a pinned schema; malformed rows or type
    mismatches fail the job (FAILFAST), they do not become nulls."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def _reject_nested(schema: T.StructType, fmt: str) -> None:
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        raise ValueError(
            f"{fmt} cannot represent nested columns {bad}; "
            "project them away or use JSONL/parquet"
        )


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as headered CSV with RFC-4180 quoting (escape = double
    quote, so embedded quotes/commas/newlines round-trip)."""
    _reject_nested(df.schema, "CSV")
    (
        df.write.mode(mode)
        .option("header", True)
        .option("escape", '"')
        # the CSV writer trims value whitespace by default — corpus text
        # must round-trip byte-identically
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read headered CSV with a pinned schema, FAILFAST on mismatch.
    multiLine handles values with embedded newlines (written under
    RFC-4180 quoting by write_csv)."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .option("mode", "FAILFAST")
        # validate header names against the pinned schema instead of
        # binding columns by position (enforceSchema's silent default)
        .option("enforceSchema", False)
        .csv(path)
    )
