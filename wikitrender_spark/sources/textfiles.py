"""Batch corpus-interchange connectors (JSON Lines / CSV / ORC) with
PINNED schemas.

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


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write as ORC (columnar, predicate-pushdown-capable — the
    interchange format when the consumer is Hive/Trino rather than a
    parquet shop). Nested types are fine; compression is Spark's
    default (zstd in 4.x)."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Read ORC against a pinned schema. ORC files are self-describing,
    so the pin here is a CONTRACT CHECK, not inference avoidance: every
    pinned column must exist in the file with EXACTLY the pinned type
    (a missing or retyped column raises — no silent cast, which would
    null out unconvertible values). Extra file columns are pruned by
    the by-name projection, which also feeds ORC's column pruning."""
    df = spark.read.orc(path)
    file_types = {f.name: f.dataType for f in df.schema.fields}
    missing = [f.name for f in schema.fields if f.name not in file_types]
    if missing:
        raise ValueError(
            f"ORC file at {path} lacks pinned columns {missing}; "
            f"file has {sorted(file_types)}"
        )
    retyped = [
        f"{f.name}: file={file_types[f.name].simpleString()} "
        f"pinned={f.dataType.simpleString()}"
        for f in schema.fields
        if file_types[f.name] != f.dataType
    ]
    if retyped:
        raise ValueError(
            f"ORC file at {path} column types diverge from the pin: {retyped}"
        )
    return df.select(*[f.name for f in schema.fields])
