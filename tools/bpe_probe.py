"""Measure the BPE encode paths (VERDICT r11 ask #2): the HOF chain
(bpe_encode — per-merge-pass cost, linear in table size) vs the
dict-backed Pandas-UDF fast path (bpe_encode_fast — cost scales with
merges that APPLY, not table size).

Two corpora, because the driver corpus is degenerate for this
question: sf0.1 documents draw from a 31-WORD vocabulary (measured
below), so the fast path's per-batch word cache collapses nearly all
work and a trained table exhausts after ~150 merges. The probe
therefore measures (a) the real corpus at the trainer's 20-merge
scale — the apples-to-apples number against the attested HOF cost —
and (b) a SYNTHETIC word-diverse corpus (seeded random 8-char words,
distinct ratio ~1, so the cache never hits: the worst case) against a
1,000+-merge WELL-FORMED synthetic table (all 676 char bigrams ranked
by corpus frequency, then 500 trigram extensions built on the top
bigrams — every merge's operands exist before it, as in a trained
table, and the bigram layer guarantees merges genuinely APPLY to
every word).

Run:  python tools/bpe_probe.py [sf_dir]
      python tools/bpe_probe.py --crossover [sf_dir]

--crossover (round 16, VERDICT r15 next-round #3 — the pad_model move
applied to the tokenizer): price tx_bpe_encode's DICTIONARY-HOF form
(distinct words -> bpe_apply_word -> join + positional re-group, the
exact q_bpe_encode plan shape) against bpe_encode_fast at padded
~1k/10k/50k-merge tables, turning the documented "swap at real
vocabularies" claim (pipeline_queries.py q_bpe_encode docstring) into
a measured curve. Tables are padded with synth_merges_layered —
deterministic, WELL-FORMED (every merge's operands exist before it;
validity pinned in tests/test_bpe_probe.py) — over the corpus's own
ranked bigram layer, so early merges genuinely apply. Two corpora
again: the real sf docs (31-word vocabulary — the dictionary form's
best case, cost ~ vocab x merges) and the synthetic word-diverse one
(distinct ratio ~1 — its worst case). The HOF form is expected to
leave its feasible region inside this range (per-merge interpreted
passes AND a Catalyst expression that grows linearly in table size,
built through py4j); the probe records failures/timeouts as data
under an explicit escalation rule (skip larger HOF sizes once a
reading exceeds HOF_BUDGET_S or fails) instead of hanging.
"""
from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from wikitrender_spark.functions import text as T  # noqa: E402


def train_merges(word_counts: dict[str, int], n: int) -> list[tuple[str, str]]:
    """Sennrich-style trainer over word frequencies: each iteration
    merges the globally most frequent adjacent symbol pair (naive
    recount per iteration — probe scale only)."""
    words = {tuple(w): c for w, c in word_counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], p))
        merges.append(best)
        left, right = best
        merged = left + right
        new_words: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def synth_corpus(spark, n_docs: int = 5000, words_per_doc: int = 54):
    """Seeded word-diverse corpus: random 8-char a-z words, ~zero
    repeated words, token count comparable to sf0.1 documents."""
    import random

    rng = random.Random(12)
    rows = [
        (
            i,
            " ".join(
                "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                        for _ in range(8))
                for _ in range(words_per_doc)
            ),
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def synth_merges_layered(
    base: tuple[tuple[str, str], ...], n_total: int
) -> tuple[tuple[str, str], ...]:
    """Well-formed n_total-merge table built in layers over an
    existing bigram-layer `base` (reused from the main run's table —
    review r12: recomputing it re-ran the corpus frequency job):
    length-3 extensions (bigram symbol + char), then length-4, ...
    until n_total merges exist — every merge's operands exist before
    it, so the table is exactly the shape a trained vocabulary has,
    at REAL vocabulary sizes (50k is the standard BPE budget). A
    n_total at or below len(base) truncates the base (review r12: the
    first cut silently returned the full base)."""
    if n_total <= len(base):
        return tuple(base[:n_total])
    merges = list(base)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    layer = ["".join(p) for p in base]  # the bigram symbols
    while len(merges) < n_total:
        nxt = []
        for sym in layer:
            for c in alphabet:
                merges.append((sym, c))
                nxt.append(sym + c)
                if len(merges) >= n_total:
                    return tuple(merges)
        layer = nxt
    return tuple(merges)


def synth_merges(docs, n_ext: int = 500) -> tuple[tuple[str, str], ...]:
    """Well-formed 1,176-merge table: all 676 char bigrams ranked by
    corpus frequency, then n_ext trigram extensions (top bigram symbol
    + next char, ranked the same way) — every merge's operands exist
    before it, and the full-bigram layer makes every adjacent char
    pair in every word a genuine hit."""
    bigram = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1), "
                    "i -> substring(w, i, 2))"
                )
            ).alias("bg")
        )
        .groupBy("bg").count().orderBy(F.desc("count"), "bg").collect()
    )
    seen = {r["bg"] for r in bigram}
    merges = [(r["bg"][0], r["bg"][1]) for r in bigram]
    # complete the bigram layer (deterministic order for unseen pairs)
    for a in "abcdefghijklmnopqrstuvwxyz":
        for b in "abcdefghijklmnopqrstuvwxyz":
            if a + b not in seen:
                merges.append((a, b))
    # trigram extensions on the most frequent bigram symbols
    ext = [(m[0] + m[1], c) for m in merges[:n_ext // 26 + 1]
           for c in "abcdefghijklmnopqrstuvwxyz"][:n_ext]
    return tuple(merges + ext)


#: Escalation budget for the HOF-dictionary form in --crossover: once
#: one size's wall (construction + evaluation) exceeds this, larger
#: sizes are SKIPPED with the reading recorded as the reason — the
#: curve is already decided at that point, and a 50k-merge nested
#: Catalyst expression can take unbounded time to even analyze.
#: PREDICTIVE variant of the same rule: before running size n, the
#: previous measured HOF reading is extrapolated linearly in merge
#: count (the form's cost model — len(merges) interpreted passes per
#: vocabulary entry plus a construction cost linear in merges); if the
#: projection exceeds PROJECTION_SLACK x budget the size is skipped
#: UP FRONT, because the post-hoc check alone would first sit through
#: the multi-hour run it exists to prevent. Slack 3x keeps borderline
#: projections measurable (linear extrapolation overestimates when
#: construction dominates the previous reading).
HOF_BUDGET_S = 120.0
PROJECTION_SLACK = 3.0


def dict_encode_counts(docs, merges):
    """tx_bpe_encode's dictionary plan shape (pipeline_queries.py
    q_bpe_encode), reduced to the total-symbol aggregate the probe
    times: posexplode -> DISTINCT words -> bpe_apply_word (the
    len(merges)-pass HOF chain, evaluated once per VOCABULARY entry)
    -> join back on the word key -> per-doc positional re-group. The
    re-group stays in the timed plan because it is part of the form's
    real cost (one narrow shuffle)."""
    from pyspark.sql import functions as F

    toks = docs.select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "w")
    )
    wsyms = toks.select("w").distinct().select(
        "w", T.bpe_apply_word(F.col("w"), merges).alias("syms")
    )
    return (
        toks.join(wsyms, "w")
        .groupBy("doc_id")
        .agg(F.sum(F.size("syms")).alias("n_syms"))
    )


def crossover(sf_dir: str) -> None:
    """The --crossover run: dict-HOF vs fast at 20/1k/10k/50k merges
    on both corpora, with the escalation rule above for the HOF form.
    One JSON line per (corpus, n_merges) so a killed run still leaves
    every completed reading on stdout."""
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    real = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).localCheckpoint()
    synth = synth_corpus(spark).localCheckpoint()
    def n_vocab(docs) -> int:
        return (
            docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
            .distinct()
            .count()
        )

    corpora = [
        ("real", real, n_vocab(real)),
        ("synth", synth, n_vocab(synth)),
    ]

    # one padded table per corpus, over that corpus's own ranked
    # bigram layer so early merges genuinely apply (pad_model rule:
    # keep the real head, pad the tail deterministically)
    sizes = [20, 1000, 10_000, 50_000]
    for cname, docs, vocab in corpora:
        base = synth_merges(docs, n_ext=0)[:676]
        table = synth_merges_layered(tuple(base), max(sizes))
        hof_dead = None  # set to the reason once the budget trips
        prev_hof: tuple[int, float] | None = None  # (n, wall) last run
        for n in sizes:
            merges = table[:n]
            rec = {
                "record": "bpe_crossover",
                "corpus": cname,
                "distinct_words": vocab,
                "n_merges": n,
            }
            t0 = time.time()
            docs.select(
                F.sum(F.size(T.bpe_encode_fast(F.col("text"), merges)))
            ).collect()
            rec["fast_s"] = round(time.time() - t0, 2)
            if hof_dead is None and prev_hof is not None:
                projected = prev_hof[1] * n / prev_hof[0]
                if projected > PROJECTION_SLACK * HOF_BUDGET_S:
                    hof_dead = (
                        f"projected {round(projected, 1)}s at {n} merges "
                        f"(linear from {prev_hof[1]}s at {prev_hof[0]}) > "
                        f"{PROJECTION_SLACK}x budget {HOF_BUDGET_S}s"
                    )
            if hof_dead is not None:
                rec["hof_s"] = None
                rec["hof_skipped"] = hof_dead
            else:
                try:
                    t0 = time.time()
                    frame = dict_encode_counts(docs, merges)
                    rec["hof_construct_s"] = round(time.time() - t0, 2)
                    t1 = time.time()
                    frame.select(F.sum("n_syms")).collect()
                    rec["hof_eval_s"] = round(time.time() - t1, 2)
                    rec["hof_s"] = round(time.time() - t0, 2)
                    prev_hof = (n, rec["hof_s"])
                    if rec["hof_s"] > HOF_BUDGET_S:
                        hof_dead = (
                            f"{n} merges took {rec['hof_s']}s > "
                            f"budget {HOF_BUDGET_S}s"
                        )
                except Exception as e:  # noqa: BLE001 — failure IS data
                    rec["hof_s"] = None
                    rec["hof_error"] = f"{type(e).__name__}: {e}"[:200]
                    hof_dead = f"{n} merges failed: {type(e).__name__}"
            if rec.get("hof_s") and rec["fast_s"]:
                rec["hof_over_fast"] = round(rec["hof_s"] / rec["fast_s"], 2)
            print(json.dumps(rec), flush=True)


def main() -> None:
    if "--crossover" in sys.argv[1:]:
        rest = [a for a in sys.argv[1:] if a != "--crossover"]
        crossover(rest[0] if rest else "/root/testdata/sf0.1")
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    wc_rows = (
        docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .groupBy("w").count().collect()
    )
    word_counts = {r["w"]: r["count"] for r in wc_rows}
    total_tokens = sum(word_counts.values())

    t0 = time.time()
    merges_corpus = train_merges(word_counts, 1000)
    train_s = time.time() - t0
    merges_small = tuple(merges_corpus[:20])

    def timeit(frame, col) -> float:
        t = time.time()
        frame.select(F.sum(F.size(col)).alias("n")).collect()
        return time.time() - t

    results = {
        "sf_dir": sf_dir,
        "n_docs": docs.count(),
        "total_tokens": total_tokens,
        "distinct_words": len(word_counts),
        "trained_merges_until_exhaustion": len(merges_corpus),
        "train_s": round(train_s, 2),
    }
    # warm the scan once so neither path pays the cold-read penalty
    docs.select(F.sum(F.length("text"))).collect()
    results["corpus_hof_20_s"] = round(
        timeit(docs, T.bpe_encode(F.col("text"), merges_small)), 2
    )
    results["corpus_fast_20_s"] = round(
        timeit(docs, T.bpe_encode_fast(F.col("text"), merges_small)), 2
    )
    results["corpus_fast_full_table_s"] = round(
        timeit(docs, T.bpe_encode_fast(F.col("text"),
                                       tuple(merges_corpus))), 2
    )

    synth = synth_corpus(spark).localCheckpoint()
    big = synth_merges(synth)
    results["synth_n_merges"] = len(big)
    results["synth_distinct_word_ratio"] = 1.0  # random 8-char words
    results["synth_hof_20_s"] = round(
        timeit(synth, T.bpe_encode(F.col("text"), big[:20])), 2
    )
    results["synth_fast_20_s"] = round(
        timeit(synth, T.bpe_encode_fast(F.col("text"), big[:20])), 2
    )
    results["synth_fast_big_s"] = round(
        timeit(synth, T.bpe_encode_fast(F.col("text"), big)), 2
    )
    results["synth_hof_per_merge_s"] = round(
        results["synth_hof_20_s"] / 20, 3
    )
    results["synth_hof_big_extrapolated_s"] = round(
        results["synth_hof_per_merge_s"] * len(big), 1
    )
    # the real-vocabulary scale point: a 50k-merge well-formed table
    # (the standard BPE budget) — the fast path's cost must stay flat
    # in table size, and the closure that ships to executors stays
    # megabyte-scale
    import pickle

    huge = synth_merges_layered(big[:676], 50_000)
    results["huge_n_merges"] = len(huge)
    results["huge_table_pickle_mb"] = round(
        len(pickle.dumps(huge)) / 1e6, 2
    )
    results["synth_fast_huge_s"] = round(
        timeit(synth, T.bpe_encode_fast(F.col("text"), huge)), 2
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
