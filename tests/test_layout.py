"""Range-clustered parquet layout (sources/layout.py): the footer
min/max statistics must actually become TIGHT under the clustered
writer — measured from the footers, not assumed — so stats-pruning
readers open ~1 file for a point predicate instead of all of them."""

from __future__ import annotations

import pytest

from wikitrender_spark.sources import layout


@pytest.fixture(scope="module")
def ids_df(spark):
    # shuffled ids so the default layout's per-file ranges are wide
    return (
        spark.range(0, 10_000)
        .selectExpr("id", "hash(id) AS scrambled", "id % 7 AS grp")
        .orderBy("scrambled")
    )


def test_clustered_files_own_disjoint_ranges(spark, ids_df, tmp_path):
    path = str(tmp_path / "clustered")
    layout.write_clustered(ids_df, path, ["id"], num_files=8)
    ranges = layout.file_ranges(path, "id")
    assert len(ranges) >= 4
    spans = sorted((mn, mx) for _, mn, mx in ranges)
    # disjoint, ordered ranges: each file owns its slice of the keyspace
    for (_, prev_mx), (next_mn, _) in zip(spans, spans[1:]):
        assert prev_mx < next_mn
    # and together they cover everything
    assert spans[0][0] == 0 and spans[-1][1] == 9_999


def test_point_predicate_prunes_to_one_clustered_file(spark, ids_df, tmp_path):
    clustered = str(tmp_path / "c2")
    default = str(tmp_path / "d2")
    layout.write_clustered(ids_df, clustered, ["id"], num_files=8)
    # default layout: whatever partitioning the shuffled frame has
    ids_df.repartition(8).write.mode("overwrite").parquet(default)

    hit_c = layout.files_overlapping(clustered, "id", 4_200, 4_300)
    hit_d = layout.files_overlapping(default, "id", 4_200, 4_300)
    n_c = len(layout.file_ranges(clustered, "id"))
    n_d = len(layout.file_ranges(default, "id"))
    # clustered: the 100-id band lives in 1 (maybe 2, at a boundary)
    # files; default: hash-scattered rows put the band in EVERY file
    assert len(hit_c) <= 2, (hit_c, n_c)
    assert len(hit_d) == n_d, (hit_d, n_d)


def test_clustered_read_roundtrip(spark, ids_df, tmp_path):
    path = str(tmp_path / "c3")
    layout.write_clustered(ids_df, path, ["id"], num_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.selectExpr("sum(id)").head()[0] == 10_000 * 9_999 // 2
