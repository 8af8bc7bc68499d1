"""Pinned schemas (FIXTURES.md A1/A2; SURVEY.md §1).

The reference is schema-dynamic (fields accessed ad hoc off parsed JSON,
/root/reference/index.js:313). We pin explicit StructTypes — a deliberate
semantic upgrade so plans are Catalyst-optimizable and scans prune columns.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# rc_event — the recentchange stream record (FIXTURES.md A1).
# Field set = union of the reference's test fixtures
# (/root/reference/test/tests.js:4-26,68-75) and every field the engine reads
# (/root/reference/index.js:244,247,280-283,313-341).
# ---------------------------------------------------------------------------
RC_EVENT_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("comment", StringType()),
        StructField("namespace", IntegerType()),
        StructField("user", StringType()),
        StructField("bot", BooleanType()),
        StructField("type", StringType()),  # 'new' marks page creation
        StructField(
            "length",
            StructType(
                [StructField("new", LongType()), StructField("old", LongType())]
            ),
        ),
        StructField("wiki", StringType()),
        StructField("server_name", StringType()),
        StructField("log_type", StringType()),  # non-null => log event
        StructField("log_action", StringType()),  # move | protect | delete
        StructField(
            "log_params", StructType([StructField("target", StringType())])
        ),
        StructField("log_action_comment", StringType()),
        # the real Wikimedia wire payload carries event time as epoch
        # seconds ('timestamp') plus an envelope ('meta') with an RFC3339
        # dt and a Kafka offset — rc_from_sse derives the pinned ts/seq
        # from these when the explicit pins below are absent.
        StructField("timestamp", LongType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("id", StringType()),
                    StructField("dt", StringType()),
                    StructField("offset", LongType()),
                ]
            ),
        ),
        # pins (SURVEY.md §2.9): explicit event time + per-key tiebreak so
        # distributed replay is deterministic (reference relies on a
        # single-threaded event loop's arrival order).
        StructField("ts", TimestampType()),
        StructField("seq", LongType()),
    ]
)

# Flat variant — what operators consume internally. Nested structs are
# flattened at the source boundary (`length.new` -> `length_new`, …) so the
# hot path works on primitive columns (better codegen, simpler state rows).
RC_EVENT_FLAT_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("comment", StringType()),
        StructField("namespace", IntegerType()),
        StructField("user", StringType()),
        StructField("bot", BooleanType()),
        StructField("type", StringType()),
        StructField("length_new", LongType()),
        StructField("length_old", LongType()),
        StructField("wiki", StringType()),
        StructField("server_name", StringType()),
        StructField("log_type", StringType()),
        StructField("log_action", StringType()),
        StructField("log_target", StringType()),
        StructField("log_action_comment", StringType()),
        StructField("ts", TimestampType()),
        StructField("seq", LongType()),
    ]
)

# ---------------------------------------------------------------------------
# page_state — one row per live page (FIXTURES.md A2; reference WikiPage,
# /root/reference/index.js:16-50).
# ---------------------------------------------------------------------------
PAGE_STATE_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("wiki", StringType()),
        StructField("title", StringType()),
        StructField("edits", LongType()),
        StructField("anonEdits", LongType()),
        StructField("isNew", BooleanType()),
        StructField("notabilityFlags", LongType()),
        StructField("volatileFlags", LongType()),
        StructField("reverts", LongType()),
        StructField("start", TimestampType()),
        StructField("updated", TimestampType()),
        StructField("contributors", ArrayType(StringType())),
        StructField("anons", ArrayType(StringType())),
        StructField("distribution", MapType(StringType(), LongType())),
        StructField("bytesChanged", LongType()),
        StructField("safe", BooleanType()),
        StructField("isProtected", BooleanType()),
    ]
)

# control_command — markSafe as a second input stream (FIXTURES.md A3;
# reference API /root/reference/index.js:409-411).
CONTROL_COMMAND_SCHEMA = StructType(
    [
        StructField("id", StringType(), nullable=False),
        StructField("command", StringType()),  # markSafe | markUnsafe
        StructField("ts", TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided testdata tables (TESTDATA.md / FIXTURES.md B).
# ---------------------------------------------------------------------------
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark, sf_dir: str, name: str, spread: bool = False):
    """Read one driver-provided parquet table. Parquet scans give us
    predicate pushdown / column pruning / partition-sized splits for free —
    at 100 TB the same call works, with splits governed by
    spark.sql.files.maxPartitionBytes.

    spread=True: if the scan yields fewer splits than cores (byte-light
    but compute-heavy tables — documents/embeddings feeding hash/HOF
    projections where per-row cost, not bytes, dominates), round-robin
    repartition to defaultParallelism. At 100 TB the file count alone
    exceeds any core count, the guard never fires, and the scan shape is
    untouched — this only ever pays one tiny extra shuffle to stop a
    single task from serializing all sketch compute."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if spread:
        # cached probe: .rdd.getNumPartitions() costs ~40-50 ms of py4j
        # per construction; the count is a pure function of the file and
        # the split config (see operators/derive._scan_partitions)
        from .operators.derive import _scan_partitions

        par = spark.sparkContext.defaultParallelism
        if _scan_partitions(df, path) < par:
            df = df.repartition(par)
    return df
