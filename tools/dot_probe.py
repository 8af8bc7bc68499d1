"""Probe (guide §1: measure BEFORE changing the operator): is the
interpreted aggregate(zip_with(...)) cosine fold the ANN family's
per-pair cost, and does a statically-unrolled codegen sum beat it?

Spark higher-order functions (ArrayAggregate, ZipWith, ArrayTransform)
are CodegenFallback — every 64-dim dot in the pair-scoring kernels
(_pair_sim, _exact_rescore, ivf_cells' argmax fold) is evaluated
interpreted, with a fresh 64-element product array allocated per pair.
EMB_DIM is static, so the same left-associative sum can be unrolled
into one SQL expression that whole-stage codegen compiles — the
simhash64_blocks / rp_project precedent.

Variants measured on the brute-force pair kernel (5 queries x corpus,
the shape of ann_bruteforce_topk / the near-dup verifiers):

  fold      aggregate(zip_with(to_double q, to_double n), 0.0, +) / norms
  unrolled  0.0 + CAST(q[1])*CAST(n[1]) + ... + CAST(q[64])*CAST(n[64])

and on the IVF assignment kernel (corpus x centroid argmax fold):

  fold      ivf_cells as shipped (inner S.dot per centroid, interpreted)
  unrolled  same outer aggregate, inner dot unrolled to 64 static terms

Values asserted BIT-IDENTICAL (collect + compare) before timings count.
Median of 3 after one warm pass, noop sink.

Usage: python tools/dot_probe.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikitrender_spark.operators import ann
from wikitrender_spark.functions import similarity as S
from wikitrender_spark.plans.pipeline_queries import ANN_QUERY_IDS, _emb
from wikitrender_spark.session import get_spark

EMB_DIM = ann.EMB_DIM


def cast_at(arr: str, i: int) -> str:
    return f"CAST(element_at({arr}, {i}) AS DOUBLE)"


def dot_sql(a: str, b: str, dim: int) -> str:
    terms = " + ".join(f"{cast_at(a, i)} * {cast_at(b, i)}" for i in range(1, dim + 1))
    return f"(0.0 + {terms})"


def l2_sql(arr: str, dim: int) -> str:
    return f"sqrt({dot_sql(arr, arr, dim)})"


def pairs_fold(emb: DataFrame) -> DataFrame:
    q = ann._with_norm(
        emb.filter(F.col("vec_id").isin(ANN_QUERY_IDS)), "query_id", "q_emb", "q_nrm"
    )
    c = ann._with_norm(emb, "neighbor_id", "n_emb", "n_nrm")
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", ann._pair_sim().alias("sim"))
    )


def pairs_unrolled(emb: DataFrame) -> DataFrame:
    def with_norm(src, idc, embc, nrmc):
        return src.selectExpr(
            f"vec_id AS {idc}",
            f"embedding AS {embc}",
            f"{l2_sql('embedding', EMB_DIM)} AS {nrmc}",
        )

    q = with_norm(
        emb.filter(F.col("vec_id").isin(ANN_QUERY_IDS)), "query_id", "q_emb", "q_nrm"
    )
    c = with_norm(emb, "neighbor_id", "n_emb", "n_nrm")
    sim = F.expr(
        f"round({dot_sql('q_emb', 'n_emb', EMB_DIM)} / (q_nrm * n_nrm), 6)"
    )
    return (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )


def cells_fold(emb: DataFrame) -> DataFrame:
    cents = ann.ivf_centroids(emb).localCheckpoint(eager=False)
    return ann.ivf_cells(emb, cents)


def cells_unrolled(emb: DataFrame) -> DataFrame:
    cents = ann.ivf_centroids(emb).localCheckpoint(eager=False)
    packed = cents.select(
        "cell", "centroid", S.l2_norm(F.col("centroid")).alias("c_nrm")
    )
    one = packed.agg(
        F.array_sort(F.collect_list(F.struct("cell", "centroid", "c_nrm"))).alias(
            "cs"
        )
    )
    df = emb.crossJoin(F.broadcast(one)).withColumn(
        "v_nrm", F.expr(l2_sql("embedding", EMB_DIM))
    )
    inner = dot_sql("embedding", "c.centroid", EMB_DIM)
    step = (
        "(acc, c) -> IF("
        "  IF(v_nrm * c.c_nrm = 0.0D, CAST(-2.0 AS DOUBLE),"
        f"     round({inner} / (v_nrm * c.c_nrm), 6)) > acc.csim,"
        "  named_struct('csim',"
        "    IF(v_nrm * c.c_nrm = 0.0D, CAST(-2.0 AS DOUBLE),"
        f"       round({inner} / (v_nrm * c.c_nrm), 6)),"
        "    'cell', c.cell),"
        "  acc)"
    )
    best = F.expr(
        "aggregate(cs, named_struct('csim', CAST(-3.0 AS DOUBLE), "
        f"'cell', CAST(-1 AS INT)), {step})"
    )
    return df.select("vec_id", best["cell"].alias("cell"))


def run(df: DataFrame) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("dot-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb = _emb(spark, sf_dir)

    for label, mk_a, mk_b, keys in (
        ("pair-sim", pairs_fold, pairs_unrolled, ["query_id", "neighbor_id"]),
        ("ivf-cells", cells_fold, cells_unrolled, ["vec_id"]),
    ):
        a = mk_a(emb)
        b = mk_b(emb)
        ra = {tuple(r[k] for k in keys): r for r in a.collect()}
        rb = {tuple(r[k] for k in keys): r for r in b.collect()}
        assert set(ra) == set(rb), f"{label}: key sets differ"
        for k, va in ra.items():
            vb = rb[k]
            assert va == vb, f"{label}: {k}: {va} != {vb}"
        print(f"{label}: {len(ra)} rows bit-identical")
        for name, mk in (("fold", mk_a), ("unrolled", mk_b)):
            times = []
            for it in range(4):
                spark.sparkContext.setJobDescription(f"{label}/{name}#{it}")
                times.append(run(mk(emb)))
            med = statistics.median(times[1:])
            print(f"  {label}/{name}: median {med:.3f}s  (runs {['%.3f' % t for t in times]})")


if __name__ == "__main__":
    main()
