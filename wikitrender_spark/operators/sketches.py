"""Count–Min sketch over the token stream (Cormode & Muthukrishnan
2005) — the fixed-memory frequency-estimation member of the sketch
family (beside HLL distinct counts and the quantile sketch in
plans/relational_queries.py, and the Bloom membership probe in
operators/dedup.py).

Why on a 100 TB corpus: exact per-term counts need a shuffle keyed by
term (vocabulary-sized state); the CMS collapses the whole stream into
D x W integer cells with map-side combine — the shuffle payload is the
SKETCH (D*W rows), not the vocabulary — and any term's count is then
estimated as min over its D cells. The construction here is
deterministic (affine row hashes over the pinned 31-poly token hash,
pure integer arithmetic), so the DuckDB twin reproduces every cell and
estimate bit-for-bit, and the overestimate-only contract
(est >= exact, never under) is checked against exact counts rather
than assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

#: sketch geometry: D hash rows x W cells. With stream length N, each
#: row's expected collision mass per cell is N/W; min over D rows makes
#: large overestimates exponentially unlikely (Markov^D). W is sized to
#: the GATE corpus's 31-word vocabulary so collisions actually happen
#: (W=16 -> ~2 terms share each cell per row) and the margin column
#: measures real collision error instead of degenerating to all-zero;
#: production sizes W ~ e/epsilon for an epsilon*N error bound.
CMS_D = 4
CMS_W = 16
#: per-row affine constants (odd multipliers, distinct offsets) over the
#: 31-poly token hash: cell_j = (A_j * th + B_j) mod 1000003 mod W
CMS_ROWS = ((293, 17), (457, 131), (683, 359), (829, 523))


def _cms_cell(th, j: int):
    a, b = CMS_ROWS[j]
    return ((th * a + b) % T.HASH_MOD) % CMS_W


def _token_stream(docs: DataFrame) -> DataFrame:
    """(tok, th) one row per token OCCURRENCE (counts, not sets)."""
    return docs.select(
        F.explode(T.tokens(F.col("text"))).alias("tok")
    ).select("tok", T.poly_hash(F.col("tok")).alias("th"))


def cms_cells(docs: DataFrame) -> DataFrame:
    """The materialized sketch: (j, cell, n) — at most D*W rows however
    large the corpus (map-side combine collapses each partition to the
    sketch before any shuffle)."""
    toks = _token_stream(docs)
    rows = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_cell(F.col("th"), j).alias("cell"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("jc")
    ).select("jc.j", "jc.cell")
    return rows.groupBy("j", "cell").agg(F.count(F.lit(1)).alias("n"))


def cms_top_terms(docs: DataFrame, k: int = 20) -> DataFrame:
    """For the exact top-``k`` terms by occurrence count (ties to the
    lexicographically smaller term): (term, exact_count, cms_est,
    margin = cms_est - exact_count). The CMS can only OVERestimate
    (every occurrence of the term lands in all D of its cells), so
    margin >= 0 is a structural invariant — pinned in tests and checked
    per row by the oracle comparison.

    Scale shape: ONE tokenization — the contract query necessarily pays
    the exact term-keyed aggregate anyway (that is what the estimates
    are checked against), so the sketch cells are summed FROM the
    per-term counts instead of re-exploding the corpus (same cell
    values: addition is associative over the per-term partition of the
    stream). The standalone ``cms_cells`` keeps the vocabulary-free
    one-pass shape for production use where no exact side exists. The
    top-k is TakeOrderedAndProject; the estimate join probes D
    broadcast-sized cells per term."""
    term_counts = (
        _token_stream(docs)
        .groupBy("tok", "th")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    exact = (
        term_counts.select("tok", "exact_count")
        .orderBy(F.desc("exact_count"), F.asc("tok"))
        .limit(k)
    )
    cell_rows = term_counts.select(
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_cell(F.col("th"), j).alias("cell"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("jc"),
    ).select("exact_count", "jc.j", "jc.cell")
    cells = cell_rows.groupBy("j", "cell").agg(
        F.sum("exact_count").alias("n")
    )
    probes = exact.select(
        "tok",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_cell(T.poly_hash(F.col("tok")), j).alias("cell"),
                    )
                    for j in range(CMS_D)
                ]
            )
        ).alias("jc"),
    ).select("tok", "exact_count", "jc.j", "jc.cell")
    return (
        probes.join(F.broadcast(cells), ["j", "cell"])
        .groupBy("tok", "exact_count")
        .agg(F.min("n").alias("cms_est"))
        .select(
            F.col("tok").alias("term"),
            F.col("exact_count").cast("long").alias("exact_count"),
            F.col("cms_est").cast("long").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_count"))
            .cast("long")
            .alias("margin"),
        )
    )
