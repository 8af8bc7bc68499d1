"""Single-pass document scoring: quality + language-ID + token count in
ONE tokenization (SURVEY.md §2.8 text-analysis family).

Why this exists: the Column-library forms (functions/text.quality_score,
predict_lang, token_count) each embed their own copy of the
``split(lower(text))`` expression tree — PySpark Column reuse duplicates
the expression, not the computed value, and higher-order-function lambdas
run interpreted (outside whole-stage codegen), so a projection computing
all three re-tokenizes every document ~7 times in the slowest evaluation
mode Spark has. Measured at sf0.1: 4.8 s for the combined projection vs
~1 s for this operator.

Shape: posexplode-free explode of the lowered token array (one split per
document, pipelined into the scan), per-token ``isin`` predicates that
stay inside whole-stage codegen, then ONE hash aggregation keyed by
(doc_id, lang, punct) — token rows of a document are co-located with
their source partition, so map-side combine collapses the shuffle to one
row per document (shuffle payload O(docs), not O(tokens)). No join-back:
the per-document scalars (label lang, punct ratio) ride along as
grouping keys. At 100 TB this is a scan + one narrow shuffle.

Arithmetic is bit-identical to the Column forms (same ops, same order,
same casts) — tx_quality / tx_langid / tx_clean_corpus oracles pin the
values; tests/test_pipeline_ops.py asserts the equivalence row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def score_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_tokens, quality, pred_lang) per document —
    drop-in for the quality/langid/token-count projection trio.

    ``n_tokens`` counts whitespace tokens (lowercasing preserves
    whitespace, so counting the lowered tokens equals
    ``token_count(text)``); ``quality`` mirrors
    functions/text.quality_score; ``pred_lang`` mirrors
    functions/text.predict_lang (argmax over stopword hits,
    lexicographically-smallest tie-break, 'und' on zero hits)."""
    t = F.col("text")
    exploded = docs.select(
        "doc_id",
        "lang",
        T.punct_ratio(t).alias("punct"),
        F.explode_outer(T.tokens(F.lower(t))).alias("tok"),
    )
    # explode_outer keeps zero-token documents as one NULL-tok row, so
    # every document survives the aggregation; count("tok") skips the
    # NULL and correctly yields 0 for them
    hit_cols = [
        F.coalesce(
            F.sum(F.col("tok").isin(*T.LANG_STOPWORDS[lang]).cast("long")),
            F.lit(0).cast("long"),
        ).alias(f"hits_{lang}")
        for lang in sorted(T.LANG_STOPWORDS)
    ]
    agg = exploded.groupBy("doc_id", "lang", "punct").agg(
        F.count("tok").alias("n_toks"), *hit_cols
    )

    n_l = F.col("n_toks")
    n = n_l.cast("double")
    length_term = F.least(n / F.lit(64.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(F.col("punct") * F.lit(4.0), F.lit(1.0))
    stop_ratio = F.when(n_l == 0, F.lit(0.0)).otherwise(
        F.col("hits_en").cast("double") / n
    )
    stop_term = F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
    quality = F.round(
        (length_term * F.lit(0.4) + punct_term * F.lit(0.4) + stop_term * F.lit(0.2)),
        6,
    )

    best = None
    best_score = None
    for lang in sorted(T.LANG_STOPWORDS):
        score = F.col(f"hits_{lang}")
        if best is None:
            best, best_score = F.lit(lang), score
        else:
            take = score > best_score
            best = F.when(take, F.lit(lang)).otherwise(best)
            best_score = F.when(take, score).otherwise(best_score)
    pred = F.when(best_score > 0, best).otherwise(F.lit("und"))

    return agg.select(
        "doc_id",
        "lang",
        n_l.cast("long").alias("n_tokens"),
        quality.alias("quality"),
        pred.alias("pred_lang"),
    )
