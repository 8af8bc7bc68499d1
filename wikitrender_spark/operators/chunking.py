"""Document chunking for training-data pipelines (SURVEY.md §2.8 family):
fixed-size token windows with overlap, one output row per chunk.

Built entirely from the stored per-doc token-hash array
(operators/dedup.doc_token_hashes — tokens hashed exactly once), so the
chunk explosion is pure integer array arithmetic: window starts via
sequence(), per-window slice(), and a 31-poly fold as the chunk
fingerprint. No shuffle beyond the one aggregation inside
doc_token_hashes; the explode multiplies rows ~n_tokens/stride-fold
without touching the original text bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from .dedup import doc_token_hashes

CHUNK_SIZE = 64
CHUNK_OVERLAP = 16


def token_chunks(
    docs: DataFrame, size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP
) -> DataFrame:
    """(doc_id, chunk_idx, n_tokens, chunk_fp): token windows of `size`
    every `size - overlap` tokens. The final window may be short; docs
    with zero tokens produce no chunks. Window starts stop at
    n - overlap: a later start's tokens would lie entirely inside the
    previous window (its only content is the shared overlap), emitting a
    chunk with zero new tokens — duplicated training data."""
    if size <= 0 or overlap < 0 or size <= overlap:
        raise ValueError(
            f"need size > overlap >= 0, got size={size} overlap={overlap}"
        )
    stride = size - overlap
    ths = F.col("ths")
    n = F.size(ths)
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(
            F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(stride)
        )
    )

    def chunk(s):
        ck = F.slice(ths, s + 1, size)
        return F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.size(ck).cast("long").alias("n_tokens"),
            F.aggregate(
                ck,
                F.lit(0).cast("long"),
                lambda h, x: (h * T.HASH_MULT + x) % T.HASH_MOD,
            ).alias("chunk_fp"),
        )

    return (
        doc_token_hashes(docs)
        .select("doc_id", F.explode(F.transform(starts, chunk)).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk_fp")
    )
