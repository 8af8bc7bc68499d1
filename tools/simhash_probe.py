"""Probe: alternative formulations of simhash64_blocks' 64 bit-vote
folds (round-16 optimization, guide §1 measure-first / §2.3 per-task
work). The current form runs 64 interpreted F.aggregate folds per doc,
recomputing the block remix hash 16x per (block, token). Variants:

  current : 64 aggregates, remix inline per bit (the shipped form)
  premix  : transform(ths, remix) once per block, then 16 cheap
            shift/and aggregates over the remixed array (remix 1x per
            (block, token) instead of 16x)
  explode : posexplode_outer the checkpointed token arrays, 64
            codegen'd conditional sums in ONE hash aggregate keyed by
            doc_id (map-side partials collapse each doc before the
            exchange), bits decided from 2*S_j > n
  nested  : one aggregate per block with an array<long> accumulator
            (inner transform captures the outer lambda variable — the
            round-13 hazard class; probe whether Spark 4.1 resolves it)

Each variant is asserted BIT-IDENTICAL to `current` on the probe data
before it is timed. Usage:

    python tools/simhash_probe.py [sf_dir] [--variants v1,v2,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikitrender_spark.operators.dedup import (
    SIMHASH_BLOCK_BITS,
    SIMHASH_BLOCKS,
    doc_token_hashes,
    simhash64_blocks,
)
from wikitrender_spark.session import get_spark


def _remix(b: int, t):
    return (F.lit(2 * b + 1) * t + F.lit(b * 7919 + 1)) % F.lit(1_000_003)


def premix_blocks(docs: DataFrame) -> DataFrame:
    ths = doc_token_hashes(docs)
    blks = []
    def mk_remix(b):
        return lambda t: _remix(b, t)

    def mk_step(j):
        return (
            lambda a, h: a + F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1
        )

    for b in range(SIMHASH_BLOCKS):
        rh = F.transform(F.col("ths"), mk_remix(b))
        bits = [
            F.when(
                F.aggregate(rh, F.lit(0).cast("long"), mk_step(j)) > 0,
                F.lit(2**j).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(SIMHASH_BLOCK_BITS)
        ]
        blks.append(sum(bits[1:], bits[0]))
    return ths.select("doc_id", F.array(*blks).alias("fp"))


def nested_blocks(docs: DataFrame) -> DataFrame:
    ths = doc_token_hashes(docs)
    blks = []
    def mk_agg(b):
        def step(acc, t):
            return F.transform(
                acc,
                lambda c, j: c
                + F.shiftright(_remix(b, t), j).bitwiseAND(F.lit(1)) * 2
                - 1,
            )

        return step

    for b in range(SIMHASH_BLOCKS):
        counts = F.aggregate(
            F.col("ths"),
            F.array_repeat(F.lit(0).cast("long"), SIMHASH_BLOCK_BITS),
            mk_agg(b),
        )
        bits = [
            F.when(
                F.element_at(counts, j + 1) > 0, F.lit(2**j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            for j in range(SIMHASH_BLOCK_BITS)
        ]
        blks.append(sum(bits[1:], bits[0]))
    return ths.select("doc_id", F.array(*blks).alias("fp"))


def explode_blocks(docs: DataFrame) -> DataFrame:
    ths = doc_token_hashes(docs)
    tok = ths.select(
        "doc_id", F.explode_outer(F.col("ths")).alias("t")
    )
    sums = [
        F.count(F.col("t")).alias("n")
    ]
    for b in range(SIMHASH_BLOCKS):
        h = _remix(b, F.col("t"))
        for j in range(SIMHASH_BLOCK_BITS):
            sums.append(
                F.sum(F.shiftright(h, j).bitwiseAND(F.lit(1))).alias(
                    f"s_{b}_{j}"
                )
            )
    agg = tok.groupBy("doc_id").agg(*sums)
    blks = []
    for b in range(SIMHASH_BLOCKS):
        bits = [
            F.when(
                F.coalesce(F.col(f"s_{b}_{j}"), F.lit(0)) * 2 > F.col("n"),
                F.lit(2**j).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            for j in range(SIMHASH_BLOCK_BITS)
        ]
        blks.append(sum(bits[1:], bits[0]))
    return agg.select("doc_id", F.array(*blks).alias("fp"))


VARIANTS = {
    "current": simhash64_blocks,
    "premix": premix_blocks,
    "explode": explode_blocks,
    "nested": nested_blocks,
}


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = list(VARIANTS)
    for a in sys.argv[1:]:
        if a.startswith("--variants"):
            names = a.split("=", 1)[1].split(",")
    spark = get_spark("simhash-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = None
    for name in names:
        fn = VARIANTS[name]
        spark.sparkContext.setJobDescription(f"simhash probe: {name}")
        try:
            df = fn(docs)
            # correctness first: bit-identical to the shipped form
            if name != "current":
                cur = simhash64_blocks(docs)
                bad = (
                    df.alias("x")
                    .join(cur.alias("y"), "doc_id", "full_outer")
                    .filter(
                        (F.col("x.fp").isNull())
                        | (F.col("y.fp").isNull())
                        | (F.col("x.fp") != F.col("y.fp"))
                    )
                    .count()
                )
                if bad:
                    print(f"{name:8s} MISMATCH rows={bad}")
                    continue
            samples = []
            for _ in range(3):
                t0 = time.monotonic()
                fn(docs).write.format("noop").mode("overwrite").save()
                samples.append(time.monotonic() - t0)
            med = sorted(samples)[1]
            print(f"{name:8s} median={med:.3f}s samples={[round(s,3) for s in samples]}")
        except Exception as e:  # noqa: BLE001 — probe reports, not dies
            print(f"{name:8s} FAILED {type(e).__name__}: {str(e)[:200]}")
        finally:
            spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
