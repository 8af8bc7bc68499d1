"""End-to-end training-corpus preparation over the documents table —
the LLM-data-pipeline operators composed the way a pretraining data run
chains them (SURVEY.md §2.8):

  1. quality + repetition filters   (tx_quality / tx_repetition signals)
  2. near-duplicate cluster dedup   (MinHash LSH -> verify -> components)
  3. eval-set decontamination       (broadcast shingle probe)
  4. sequence packing               (fixed token budget per pack)
  5. corpus vocabulary              (top-K token frequencies)
  6. survival funnel + mix sampling (stage report; DoReMi keep decisions)
  7. semantic dedup over embeddings (IVF cells -> within-cell cosine)
  8-14. substring-run stats + scrub, PQ/IVF-PQ retrieval (plain and
        shortlist-re-ranked), length histogram, Bloom decontamination
        with measured false positives, Count-Min top terms
  15-17. cards-first Luhn + widened-table PII scrub, DSIR importance
        selection (linear + log-space), the bigram-LM perplexity
        filter (round 12) + its CCNet head/middle/tail terciles
        (round 13), perceptual near-dup across the image / audio /
        video modality legs incl. the content-crop production
        configurations (single-corner r12; four-corner per-channel
        r13)
  18.   ORC export

Every step is a DataFrame transformation: at 100 TB the same composition
runs with the same plans — bucketed joins, broadcast probes, map-combined
aggregates — just with more partitions.

Run:  python examples/prepare_corpus.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikitrender_spark.functions import text as T
from wikitrender_spark.operators import ann, dedup
from wikitrender_spark.plans.pipeline_queries import (
    q_length_histogram,
    PACK_TOKEN_BUDGET,
    q_clean_corpus,
    q_filter_funnel,
    q_mix_sample,
    q_mix_weights,
    q_pack,
    q_pack_split,
    q_repetition,
    q_vocab,
)
from wikitrender_spark.schemas import load_table
from wikitrender_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("prepare-corpus", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # 1. quality gates: drop highly repetitive documents
    rep = q_repetition(spark, sf_dir)
    keep_q = rep.filter(
        (F.col("dup_trigram_ratio") < 0.8) & (F.col("n_tokens") >= 5)
    ).select("doc_id")
    print(f"quality gate: {keep_q.count()}/{n_docs} docs pass")

    # 2. near-dup dedup: drop every clustered doc except its cluster's
    # min-id representative (duplicate_clusters emits only docs that ARE
    # in a near-dup component; unclustered docs all survive)
    clusters = dedup.duplicate_clusters(docs)
    reps = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    dropped = clusters.join(reps.select("doc_id"), "doc_id", "left_anti")
    survivors = docs.select("doc_id").join(dropped, "doc_id", "left_anti")
    print(
        f"dedup: {dropped.count()} near-dup docs dropped, "
        f"{survivors.count()} survive"
    )

    # 3. decontamination: drop training docs overlapping the eval slice
    clean = dedup.decontamination_flags(docs).filter(~F.col("contaminated"))
    print(f"decontamination: {clean.count()} clean training docs")

    # intersect the three gates
    final = (
        keep_q.join(survivors, "doc_id").join(clean.select("doc_id"), "doc_id")
    )
    print(f"final corpus: {final.count()} docs")

    # 3b. removal lineage: why is each dropped doc absent, and what
    # surviving doc supersedes it (audit relation for the two dedup gates)
    lineage = dedup.dedup_lineage(docs)
    by_reason = {
        r["reason"]: r["n"]
        for r in lineage.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    print(f"lineage: drops by reason {by_reason}")

    # 4. pack into fixed-token-budget sequences
    packs = q_pack(spark, sf_dir).join(final, "doc_id")
    n_packs = packs.select("lang", "source", "pack_id").distinct().count()
    print(f"packing: {n_packs} packs of <= {PACK_TOKEN_BUDGET} tokens")

    # 4b. boundary-split packing: exact 512-token packs (docs sliced at
    # pack boundaries) — what the batch assembler actually consumes
    splits = q_pack_split(spark, sf_dir).join(final, "doc_id")
    n_slices = splits.count()
    n_split_docs = splits.groupBy("doc_id").count().filter("count > 1").count()
    print(f"pack-split: {n_slices} slices, {n_split_docs} docs straddle packs")

    # 4c. training-mix reweighting: per-domain sampling weights that
    # equalize the (lang, source) token shares
    mix = q_mix_weights(spark, sf_dir)
    w = mix.agg(
        F.min("sample_weight").alias("lo"), F.max("sample_weight").alias("hi")
    ).head()
    print(f"mix weights: {mix.count()} domains, weight range "
          f"[{w['lo']:.3f}, {w['hi']:.3f}]")

    # 5. vocabulary over the corpus
    vocab = q_vocab(spark, sf_dir)
    top = ", ".join(
        f"{r['token']}({r['n_occurrences']})" for r in vocab.take(5)
    )
    print(f"vocab head: {top}")

    # the composed clean-corpus query (quality + cluster dedup in one plan)
    print(f"q_clean_corpus rows: {q_clean_corpus(spark, sf_dir).count()}")

    # 5b. apply the trained merges (round 11): BPE-encode the corpus
    # with the trainer's own top-ranked pairs — train -> encode closes
    # the tokenizer loop, and packing can budget on real symbol counts
    from wikitrender_spark.plans.pipeline_queries import q_bpe_merges

    merge_rows = sorted(
        q_bpe_merges(spark, sf_dir).collect(), key=lambda r: r["merge_rank"]
    )
    merges = tuple((r["pair"][0], r["pair"][1]) for r in merge_rows)
    benc = docs.select(
        F.size(T.bpe_encode(F.col("text"), merges)).alias("n_sym"),
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_chars"),
    ).agg(F.sum("n_sym").alias("s"), F.sum("n_chars").alias("c")).head()
    print(
        f"bpe encode: {benc['s']} symbols from {benc['c']} chars "
        f"({benc['s'] / benc['c']:.3f} symbols/char, "
        f"{len(merges)} trained merges)"
    )

    # 6. the stage-survival funnel (per-stage counts) and the mix-weight
    # sampling decision a data loader applies on top of the weights
    for r in sorted(
        q_filter_funnel(spark, sf_dir).collect(), key=lambda r: r["stage_idx"]
    ):
        print(f"funnel[{r['stage_idx']}] {r['stage']}: {r['n_docs']}")
    kept = q_mix_sample(spark, sf_dir).filter("keep").count()
    print(f"mix sample: {kept}/{n_docs} docs kept at the uniform target")

    # 7. semantic dedup over the embedding corpus (SemDeDup shape)
    sem = ann.semantic_dedup(load_table(spark, sf_dir, "embeddings"))
    n_dropped = sem.filter(~F.col("is_kept")).count()
    print(f"semantic dedup: {n_dropped} vectors dropped within cells")

    # 8. substring-run dedup report (ExactSubstr complement to MinHash)
    runs = dedup.substring_run_stats(docs)
    n_run_dup = runs.filter(F.col("n_dup_runs") > 0).count()
    print(f"substring runs: {n_run_dup} docs share an 8-token run")

    # 9. compressed retrieval tier: PQ codes + ADC top-k over the
    # embedding corpus (what a retrieval-augmented loader would serve)
    pq = ann.pq_topk(load_table(spark, sf_dir, "embeddings"), [0, 1], k=3)
    print(f"pq retrieval: {pq.count()} (query, neighbor) rows at k=3")

    # 10. length histogram (the packing-budget planning report)
    hist = q_length_histogram(spark, sf_dir).orderBy("bucket_lo")
    buckets = ", ".join(
        f"{r['bucket_lo']}:{r['n_docs']}" for r in hist.collect()
    )
    print(f"token-length histogram: {buckets}")

    # 11. bounded-memory decontamination: the Bloom probe beside the
    # exact one, with its false positives measured per doc
    bl = dedup.bloom_decontamination_flags(docs).agg(
        F.sum("n_exact_hits").alias("exact"),
        F.sum("n_bloom_hits").alias("bloom"),
        F.sum("fp_shingles").alias("fp"),
    ).head()
    print(
        f"bloom decontamination: {bl['exact']} exact hits, "
        f"{bl['bloom']} bloom hits ({bl['fp']} measured false positives)"
    )

    # 12. Count-Min frequency sketch: top terms with overestimate margin
    from wikitrender_spark.operators import sketches

    cms = sketches.cms_top_terms(docs, k=5).orderBy(F.desc("exact_count"))
    head = ", ".join(
        f"{r['term']}({r['exact_count']}+{r['margin']})" for r in cms.collect()
    )
    print(f"cms top terms (exact+margin): {head}")

    # 13. substring scrub (the ExactSubstr ACTION): covered positions
    # removed outside each run's keeper doc
    scrub = dedup.substring_scrub(docs)
    sc = scrub.agg(
        F.sum("n_tokens").alias("toks"), F.sum("n_removed").alias("rm")
    ).head()
    print(f"substring scrub: {sc['rm']}/{sc['toks']} tokens removed")

    # 14. re-ranked compressed retrieval (the serving configuration:
    # ADC shortlist -> exact rescore -> re-rank)
    rr = ann.ivf_pq_topk(
        load_table(spark, sf_dir, "embeddings"), [0, 1], k=3, shortlist=30
    )
    print(f"ivfpq re-ranked retrieval: {rr.count()} rows at k=3, R=30")

    # 15. PII redaction (round-11 production form) and carry the
    # REDACTED text forward — step 18 exports it, never the raw text.
    # ORDER CONTRACT: credit cards FIRST (the Luhn-validated splice,
    # covering contiguous 13-19 digit runs AND space/dash-grouped
    # forms like "4111 1111 1111 1111" since round 12; [CARD] is
    # digit-free so no later pattern can touch it — the reverse order
    # can split a card run, see functions/text.py), then
    # the widened pattern table (+IPv6, +international phones). On this
    # synthetic corpus every count is zero (no organic PII; the gated
    # tx_pii_scrub plants deterministic PII to attest the scrub), but
    # the pass belongs in every real pipeline.
    card_red, n_card_cand, n_card_valid = T.scrub_cards(F.col("text"))
    red, counts = T.scrub_pii(card_red, T.PII_PATTERNS_EXTENDED)
    scrubbed_docs = docs.select(
        "doc_id", red.alias("text"), "lang", "source", "n_chars",
        n_card_cand.alias("n_card_cand"),
        n_card_valid.alias("n_card"),
        *(counts[k] for k, _, _ in T.PII_PATTERNS_EXTENDED),
    )
    pii = scrubbed_docs.agg(
        F.sum("n_card_cand").alias("card_cand"),
        F.sum("n_card").alias("card"),
        *(F.sum(f"n_{k}").alias(k) for k, _, _ in T.PII_PATTERNS_EXTENDED),
    ).head()
    scrubbed_docs = scrubbed_docs.drop(
        "n_card_cand", "n_card",
        *(f"n_{k}" for k, _, _ in T.PII_PATTERNS_EXTENDED),
    )
    print(
        f"pii scrub: card={pii['card']} (of {pii['card_cand']} digit-run "
        "candidates), "
        + ", ".join(f"{k}={pii[k]}" for k, _, _ in T.PII_PATTERNS_EXTENDED)
    )

    # 16. DSIR importance weights (round 10): target-vs-raw bigram mass;
    # keep decisions on the exact integer cross-product
    from wikitrender_spark.plans.pipeline_queries import dsir_weights

    linear = dsir_weights(docs)  # bound once; 16b joins against it too
    dw = linear.agg(
        F.sum(F.col("selected").cast("long")).alias("kept"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    print(f"dsir selection: {dw['kept']}/{dw['n']} docs more target-like")

    # 16b. the log-space DSIR form (round 11): the production variant
    # for corpora whose count cross-products would pass 2^53 — same
    # selection intent, scores summed as portable-ln log-ratios. The
    # two forms are different estimators (log of mass-sum vs sum of
    # log-ratios), so agreement is expected to be strong, not exact.
    from wikitrender_spark.plans.pipeline_queries import dsir_log_weights

    both = (
        linear
        .select("doc_id", F.col("selected").alias("lin"))
        .join(
            dsir_log_weights(docs).select(
                "doc_id", F.col("selected").alias("log")
            ),
            "doc_id",
        )
        .agg(
            F.sum(F.col("log").cast("long")).alias("kept_log"),
            F.sum((F.col("lin") == F.col("log")).cast("long")).alias("agree"),
            F.count(F.lit(1)).alias("n"),
        )
        .head()
    )
    print(
        f"dsir log-space: {both['kept_log']}/{both['n']} kept, "
        f"agrees with linear on {both['agree']}/{both['n']}"
    )

    # 16c. bigram-LM perplexity filter (round 12, the CCNet-style
    # quality cut): score every doc's NLL under the add-one corpus
    # bigram model (portable-ln, order-pinned folds — the gated
    # tx_ngram_nll operator) and report the selected (at-or-below
    # corpus-mean per-bigram NLL) head. The trained model also drives
    # the STREAMING admission gate via ngram_model + ngram_nll_scorer.
    from wikitrender_spark.plans.pipeline_queries import ngram_nll

    ppl = ngram_nll(docs).agg(
        F.sum(F.col("selected").cast("long")).alias("kept"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    print(f"perplexity filter: {ppl['kept']}/{ppl['n']} docs at/below "
          "corpus-mean per-bigram NLL")

    # 16d. CCNet head/middle/tail terciles (round 13): the deployment
    # shape — rank by per-bigram NLL, split into thirds; the head
    # feeds high-quality training, the tail is the usual discard
    from wikitrender_spark.plans.pipeline_queries import ngram_ppl_buckets

    for b in ngram_ppl_buckets(docs).collect():
        print(f"ppl bucket {b['bucket']}: {b['n_docs']} docs, "
              f"unit-NLL [{b['min_unit_nll']}, {b['max_unit_nll']}]")

    # 17. perceptual image near-dup (round 10): the documents-as-PGM
    # rasters decode through the real netpbm -> dHash kernel; pairs
    # within Hamming 3 are cross-modality duplicates text dedup misses
    from wikitrender_spark.operators import multimodal

    pairs = multimodal.dhash_hamming_pairs(
        multimodal.image_dhash(multimodal.documents_as_pgm(docs))
    )
    print(f"image dhash near-dup pairs (hamming<=3): {pairs.count()}")

    # 17b. audio near-dup (round 11): the same documents as PCM16 WAV
    # payloads through the energy-envelope hash — the third leg of the
    # modality-dedup triangle, on the same Manku block join
    apairs = multimodal.dhash_hamming_pairs(
        multimodal.audio_envelope_hash(multimodal.documents_as_wav(docs))
    )
    print(f"audio envelope near-dup pairs (hamming<=3): {apairs.count()}")

    # 17c. content-region fingerprinting (round 11): the production
    # configuration for padded/letterboxed corpora — cropping before
    # the hash dissolves the flat-padding bucket (985,871 -> 10,006
    # uncapped candidates at sf0.1; see SCALE.md round-11) and makes
    # every hash bit describe content, a stricter similarity test
    cpairs = multimodal.dhash_hamming_pairs(
        multimodal.image_dhash_content(multimodal.documents_as_pgm(docs))
    )
    print(f"content-crop dhash near-dup pairs (hamming<=3): {cpairs.count()}")

    # 17d. video projection near-dup (round 13): the fourth modality
    # leg — real Y4M decode into per-frame row+column luma projections,
    # cyclic sign-of-delta bits, the SAME shared Manku block join
    vpairs = multimodal.dhash_hamming_pairs(
        multimodal.video_projection_hash(multimodal.documents_as_y4m(docs))
    )
    print(f"video projection near-dup pairs (hamming<=3): {vpairs.count()}")

    # 17e. generalized content crop (round 13): the four-corner,
    # per-channel production knob — on THIS corpus (right/bottom space
    # padding) it agrees with the attested single-corner rule, so the
    # pair count matches 17c; corpora with top/left or color padding
    # are where the two diverge (pytest-pinned planted rasters)
    c4pairs = multimodal.dhash_hamming_pairs(
        multimodal.image_dhash_content4(multimodal.documents_as_pgm(docs))
    )
    print(f"4-corner content-crop near-dup pairs (hamming<=3): {c4pairs.count()}")

    # 18. export the final corpus as ORC (pinned-schema interchange) —
    # the SCRUBBED text from step 15, never the raw column
    import tempfile

    from wikitrender_spark.sources import textfiles

    out = tempfile.mkdtemp(prefix="corpus_orc_")
    final_docs = scrubbed_docs.join(final, "doc_id")
    textfiles.write_orc(final_docs, out)
    back = textfiles.read_orc(spark, out, final_docs.schema)
    print(f"orc export: {back.count()} scrubbed docs round-tripped at {out}")


if __name__ == "__main__":
    main()
