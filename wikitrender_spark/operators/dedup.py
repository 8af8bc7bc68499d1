"""Deduplication operators for the LLM-data pipeline (SURVEY.md §2.8):
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each variant at 100 TB):
- exact: one hash-aggregate on a 128-bit content digest — the digest
  (md5 here, for oracle portability; xxhash128 in production) collapses
  the shuffle payload from document bytes to 16 bytes + ids.
- n-gram Jaccard: exact pairwise similarity via an inverted index
  (explode distinct shingles -> self-join) — the ground-truth oracle for
  the sketch variants; quadratic in the worst case, only run on candidate
  subsets at scale.
- MinHash+LSH: per-doc signatures are narrow projections (no shuffle);
  banding turns near-dup search into an equi-join on band keys — the
  linear-ish scale path. Band-key groupBy is AQE-skew-safe.
- SimHash: one 16-bit locality-sensitive fingerprint per doc; Hamming
  neighbors cluster under prefix buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Window

from ..functions import similarity as S
from ..functions import text as T

MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4
NEAR_DUP_THRESHOLD = 0.8


def exact_dedup_groups(docs: DataFrame) -> DataFrame:
    """Content-identical groups: digest -> copy count + keeper (min id)."""
    return (
        docs.select(F.md5("text").alias("digest"), "doc_id")
        .groupBy("digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def token_hash_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, th): one row per token with its portable hash.

    The explode-to-rows layout (rather than nested array lambdas) is
    deliberate: the per-token hash is computed exactly once, whole-stage
    codegen stays flat, and every downstream sketch becomes a plain
    aggregation — the shape that scales to 100 TB token tables."""
    return docs.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "tok")
    ).select("doc_id", "pos", T.poly_hash(F.col("tok")).alias("th"))


def shingle_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, shingle): word-trigram shingle hashes via window
    lead() over the token rows — no self-join, one shuffle on doc_id."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    th1 = F.lead("th", 1).over(w)
    th2 = F.lead("th", 2).over(w)
    return (
        token_hash_rows(docs)
        .select(
            "doc_id",
            "pos",
            (
                ((F.col("th") * 31 + th1) % T.HASH_MOD * 31 + th2) % T.HASH_MOD
            ).alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
    )


def doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) distinct word-trigram shingle hashes."""
    return shingle_rows(docs).select("doc_id", "shingle").distinct()


def ngram_jaccard_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Exact pairwise Jaccard >= threshold via inverted-index self-join."""
    ex = doc_shingles(docs)
    sizes = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, signature array<long> of length k): k permutation minima
    as k plain min() aggregates over the shingle rows (map-side partial
    min -> tiny shuffle), then packed into an array. Docs with no shingles
    (< 3 tokens) get the sentinel signature."""
    sh = shingle_rows(docs)
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(
                ((2 * j + 1) * F.col("shingle") + j * 7919 + 1) % T.HASH_MOD
            ).alias(f"mh{j}")
            for j in range(k)
        ]
    )
    sentinel = F.array(*[F.lit(S.EMPTY_SIG).cast("long")] * k)
    return (
        docs.select("doc_id")
        .join(mins, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("mh0").isNull(), sentinel)
            .otherwise(F.array(*[F.col(f"mh{j}") for j in range(k)]))
            .alias("signature"),
        )
    )


def lsh_candidate_pairs(
    docs: DataFrame, k: int = MINHASH_K, bands: int = LSH_BANDS, rows: int = LSH_ROWS
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one LSH band."""
    sig = minhash_signatures(docs, k)
    banded = sig.select(
        "doc_id",
        F.posexplode(S.lsh_bands(F.col("signature"), bands, rows)).alias(
            "band_idx", "band_key"
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def near_duplicates(
    docs: DataFrame, threshold: float = NEAR_DUP_THRESHOLD
) -> DataFrame:
    """LSH candidates verified with exact Jaccard — the full
    minhash -> band -> bucket-join -> verify pipeline."""
    cands = lsh_candidate_pairs(docs)
    exact = ngram_jaccard_pairs(docs, threshold)
    return cands.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "jaccard"
    )


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """16-bit SimHash as 16 vote-sum aggregates over the token-hash rows
    (bit j of the hash votes +1/-1; bit set iff the sum is positive).
    Docs with zero tokens hash to 0."""
    th = token_hash_rows(docs)
    p2 = [F.lit(2 ** j).cast("long") for j in range(16)]
    votes = th.groupBy("doc_id").agg(
        *[
            F.sum(((F.col("th") / p2[j]).cast("long") % 2) * 2 - 1).alias(f"v{j}")
            for j in range(16)
        ]
    )
    sim = sum(
        (F.when(F.col(f"v{j}") > 0, 2 ** j).otherwise(0) for j in range(16)),
        F.lit(0),
    ).cast("long")
    return (
        docs.select("doc_id")
        .join(votes, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("v0").isNull(), F.lit(0).cast("long"))
            .otherwise(sim)
            .alias("simhash"),
        )
    )
