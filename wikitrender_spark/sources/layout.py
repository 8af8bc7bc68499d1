"""Write-side data layout for scan pruning: range-clustered parquet.

At 100 TB the cheapest query is the one that never reads the file:
parquet footers carry per-row-group min/max statistics, and every
engine (Spark, DuckDB, Trino, Hive) skips row groups whose stats
exclude the predicate. Those stats are only TIGHT if the writer
clusters rows — a randomly-laid-out file has min≈global-min,
max≈global-max on every row group and skips nothing.

``write_clustered`` = ``repartitionByRange(cluster_cols)`` (one range
shuffle: each output file owns a disjoint slice of the key space) +
``sortWithinPartitions`` (row groups within a file are tight too) +
parquet. The cost is one extra shuffle at write time, paid once; every
selective read over the cluster key afterwards prunes to the few files
whose range overlaps the predicate.

``file_ranges`` reads the footers back (pyarrow, no Spark job) so the
tightness is MEASURABLE: tests assert a point predicate overlaps ~1
clustered file vs all files under the default layout, instead of
trusting the writer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on ``cluster_cols``: files own
    disjoint key ranges (range partitioning) and rows inside each file
    are sorted (tight row-group stats). ``num_files`` defaults to the
    current shuffle parallelism."""
    cols = [df[c] for c in cluster_cols]
    part = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode(mode).parquet(path)


def file_ranges(path: str, column: str) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``column`` per parquet file under ``path``,
    from footer statistics only (no data read). Raises if any row group
    lacks statistics — a stats-less file can never be skipped."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        idx = {
            meta.schema.column(i).name: i for i in range(meta.num_columns)
        }[column]
        mins, maxs = [], []
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError(f"{f} row group {rg} has no {column} stats")
            mins.append(st.min)
            maxs.append(st.max)
        out.append((f, min(mins), max(maxs)))
    return out


def files_overlapping(
    path: str, column: str, lo: object, hi: object
) -> list[str]:
    """Files whose ``column`` footer range intersects [lo, hi] — the set
    a stats-pruning reader actually opens for that predicate."""
    return [
        f for f, mn, mx in file_ranges(path, column)
        if not (mx < lo or mn > hi)
    ]
