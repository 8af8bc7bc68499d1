"""Round-trip tests for the JSONL / CSV connectors: pinned schemas,
loud failure on malformed input, RFC-4180 escaping."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from wikitrender_spark.sources import textfiles as TF

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _docs(spark):
    rows = [
        (1, 'plain words', "en"),
        (2, 'comma, separated, values', "en"),
        (3, 'a "quoted" phrase and a ,comma', "de"),
        (4, "unicode: café 中文 \U0001f600", "fr"),
        (5, "", "en"),
    ]
    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_jsonl_roundtrip_exact(spark, tmp_path):
    d = _docs(spark)
    TF.write_jsonl(d, str(tmp_path / "docs_jsonl"))
    back = TF.read_jsonl(spark, str(tmp_path / "docs_jsonl"), DOC_SCHEMA)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_jsonl_roundtrips_array_columns(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    d = spark.createDataFrame([(1, [0.5, -1.25]), (2, [])], schema)
    TF.write_jsonl(d, str(tmp_path / "emb_jsonl"))
    back = TF.read_jsonl(spark, str(tmp_path / "emb_jsonl"), schema)
    assert {r["vec_id"]: r["embedding"] for r in back.collect()} == {
        1: [0.5, -1.25],
        2: [],
    }


def test_csv_roundtrip_with_quoting(spark, tmp_path):
    d = _docs(spark)
    TF.write_csv(d, str(tmp_path / "docs_csv"))
    back = TF.read_csv(spark, str(tmp_path / "docs_csv"), DOC_SCHEMA)
    got = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
    want = {r["doc_id"]: (r["text"], r["lang"]) for r in d.collect()}
    # CSV cannot distinguish empty string from null; pin that the only
    # divergence is '' -> None (the documented format limitation)
    assert got[5] == (None, "en") and want[5] == ("", "en")
    del got[5], want[5]
    assert got == want


def test_csv_rejects_nested_columns(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    d = spark.createDataFrame([(1, [1.0])], schema)
    with pytest.raises(ValueError, match="embedding"):
        TF.write_csv(d, str(tmp_path / "bad_csv"))


def test_jsonl_failfast_on_malformed_row(spark, tmp_path):
    p = tmp_path / "bad_jsonl"
    p.mkdir()
    (p / "part-00000.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en"}\n'
        "this is not json\n"
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        TF.read_jsonl(spark, str(p), DOC_SCHEMA).collect()


def test_csv_preserves_edge_whitespace(spark, tmp_path):
    d = spark.createDataFrame([(1, "  padded text  ", "en")], DOC_SCHEMA)
    TF.write_csv(d, str(tmp_path / "ws_csv"))
    back = TF.read_csv(spark, str(tmp_path / "ws_csv"), DOC_SCHEMA)
    assert back.collect()[0]["text"] == "  padded text  "


def test_csv_rejects_reordered_schema(spark, tmp_path):
    d = _docs(spark)
    TF.write_csv(d, str(tmp_path / "order_csv"))
    reordered = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),  # swapped with text
            T.StructField("text", T.StringType()),
        ]
    )
    with pytest.raises(Exception, match="(?i)header|schema|csv"):
        TF.read_csv(spark, str(tmp_path / "order_csv"), reordered).collect()


def test_orc_roundtrip_exact(spark, tmp_path):
    d = _docs(spark)
    TF.write_orc(d, str(tmp_path / "orc"))
    back = TF.read_orc(spark, str(tmp_path / "orc"), DOC_SCHEMA)
    assert back.schema == DOC_SCHEMA
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, d.collect()))


def test_orc_pins_reject_missing_and_retyped_columns(spark, tmp_path):
    d = _docs(spark)
    TF.write_orc(d, str(tmp_path / "orc2"))
    extra = T.StructType(
        DOC_SCHEMA.fields + [T.StructField("absent", T.LongType())]
    )
    with pytest.raises(ValueError, match="lacks pinned columns"):
        TF.read_orc(spark, str(tmp_path / "orc2"), extra)
    retyped = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),  # file has long
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    with pytest.raises(ValueError, match="diverge"):
        TF.read_orc(spark, str(tmp_path / "orc2"), retyped)


def test_orc_prunes_extra_file_columns(spark, tmp_path):
    d = _docs(spark).selectExpr("doc_id", "text", "lang", "doc_id * 2 AS extra")
    TF.write_orc(d, str(tmp_path / "orc3"))
    back = TF.read_orc(spark, str(tmp_path / "orc3"), DOC_SCHEMA)
    assert back.columns == ["doc_id", "text", "lang"]
    assert back.count() == 5
