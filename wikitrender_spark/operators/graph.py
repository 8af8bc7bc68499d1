"""Edit-transition graph operators: Markov transitions and fixed-point
integer PageRank over the per-user page-to-page edit sequence.

The reference (/root/reference/index.js) keeps per-page cumulative state
only — it has no notion of HOW editors move between pages. These are
SURVEY.md §2.8 additions: the graph-centrality layer a trending engine
runs next to its counters (which pages sit at the center of editing
traffic, not merely which receive the most edits).

Graph derivation: consecutive edits by the SAME user (ordered by
(ts, seq) — seq is the unique event id, so the order is total) form a
directed edge src -> dst between distinct page ids; edge weight is the
transition count. This is the clickstream-graph shape, linear in the
event count via one lag window partitioned by user.

Determinism / oracle portability (see plans/sqlgen.py twins): every
PageRank quantity is BIGINT fixed-point — scores scaled by 1e6,
per-edge contribution floor((score * w) / out_w), damping applied as
150000 + floor(85 * mass / 100) — so iteration results are integer sums
(order-independent) and bit-identical across engines; no float crosses
the oracle boundary. Spark's `DIV` and DuckDB's `//` agree because every
operand is non-negative (truncation == floor).

Overflow bound: the per-edge product score * w must stay under 2^63.
Total mass is conserved at ~n_nodes * 1e6 (teleport replaces floor
loss), so score <= ~1e6 * n_nodes and the product is safe while
n_nodes * max_edge_weight < 9e12 — e.g. 1e8 pages with hot-pair
transition counts up to 9e4. Beyond that, rescale SCALE down or move
the contribution arithmetic to DECIMAL(38,0) (the hourly_anomalies
idiom); non-ANSI Spark would wrap silently while DuckDB raises.

Scale shape (100 TB story):
- edit_transitions: one shuffle on user for the lag window (bounded
  per-user payload: a user's own event sequence), one hash-agg on
  (src, dst). No collect.
- pagerank: the edges relation is localCheckpoint'd ONCE and re-read
  each iteration; each of the K (fixed, default 5) iterations is one
  shuffle join edges(src) x scores(node) plus one hash-agg on dst —
  the standard iterative-graph DataFrame shape (same as
  dedup.dup_clusters' HashMin loop), with localCheckpoint cutting
  lineage so plan depth stays O(1) per iteration instead of O(K).
  Join strategy is left to AQE: scores is |nodes|-sized (can be 1e8+
  at web scale), so no broadcast hint (the tx_collocations lesson).
- top-k cut: orderBy + limit compiles to TakeOrderedAndProject
  (per-partition heaps + driver merge of k rows), never a global sort
  (the tx_bm25_topk lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: fixed-point scale: initial score per node (1.0 == 1e6).
SCALE = 1_000_000
#: damping 0.85 as the rational pair (85, 100); teleport = 0.15 * SCALE.
DAMP_NUM, DAMP_DEN = 85, 100
TELEPORT = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN  # 150_000
#: fixed iteration count — the DECLARED semantics (not a convergence
#: heuristic), so the oracle twin can unroll exactly K stages.
PAGERANK_ITERS = 5


def edit_transitions(edit_events: DataFrame) -> DataFrame:
    """(src, dst, w): distinct-page transitions between consecutive
    edits by the same user, from a classified edit-event relation with
    (user, ts, seq, id) columns (operators/page_state.
    classified_edit_events). Self-loops (consecutive edits to the same
    page) are not transitions and are dropped."""
    w = Window.partitionBy("user").orderBy("ts", "seq")
    return (
        edit_events.select("user", "ts", "seq", "id")
        .withColumn("src", F.lag("id").over(w))
        .filter(F.col("src").isNotNull() & (F.col("src") != F.col("id")))
        .groupBy("src", F.col("id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )


def out_weights(trans: DataFrame) -> DataFrame:
    """(src, out_w): total outgoing transition weight per source page."""
    return trans.groupBy("src").agg(F.sum("w").alias("out_w"))


def markov_top_transitions(trans: DataFrame, k: int = 25) -> DataFrame:
    """Top-k transitions by count with their Markov row context: the
    empirical transition probability src->dst is the RATIONAL pair
    (w, out_w) — never materialized as a float, per the oracle
    portability rule. Deterministic cut: (w desc, src, dst) is a total
    order. TakeOrderedAndProject shape (no global sort).

    trans is localCheckpoint'd before the join with its own
    re-aggregation: both join branches consume it, and without the
    barrier the whole classified-events lag-window pipeline would be
    recomputed per branch (the pagerank/lsh precedent; ADVICE r7)."""
    trans = trans.localCheckpoint()
    return (
        trans.join(out_weights(trans), "src")
        .orderBy(F.desc("w"), F.asc("src"), F.asc("dst"))
        .limit(k)
        .select("src", "dst", "w", "out_w")
    )


def pagerank(
    trans: DataFrame, iters: int = PAGERANK_ITERS
) -> DataFrame:
    """(node, score): fixed-point integer PageRank after exactly
    `iters` synchronous iterations from a uniform SCALE start.

        score_{k+1}(v) = TELEPORT
                       + (DAMP_NUM * sum_{u->v} floor(score_k(u) * w / out_w(u))) DIV DAMP_DEN

    Dangling pages cannot exist in this graph by construction (every
    node in `nodes` appears as a src or dst of some edge, and a node
    that is only ever a dst simply contributes nothing — its mass
    leaks, the standard simplified-PageRank treatment; document-level
    rank ORDER is what the operator serves).

    The edges relation (trans + out-weights) is checkpointed once and
    re-read every iteration; scores are checkpointed per iteration to
    cut lineage (see module docstring for the full scale shape)."""
    # barrier before the self-referential join: both branches (trans
    # itself and its out-weight re-aggregation) would otherwise
    # recompute the upstream lag-window pipeline while materializing
    # the edges checkpoint
    trans = trans.localCheckpoint()
    edges = (
        trans.join(out_weights(trans), "src")
        .select("src", "dst", "w", "out_w")
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    scores = nodes.select(
        "node", F.lit(SCALE).cast("bigint").alias("score")
    )
    for _ in range(iters):
        mass = (
            edges.join(scores, edges.src == scores.node)
            .select(
                F.col("dst"),
                F.expr("(score * w) DIV out_w").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("mass"))
        )
        scores = (
            nodes.join(mass, nodes.node == mass.dst, "left")
            .select(
                "node",
                (
                    F.lit(TELEPORT)
                    + F.expr(
                        f"({DAMP_NUM} * coalesce(mass, 0)) DIV {DAMP_DEN}"
                    )
                )
                .cast("bigint")
                .alias("score"),
            )
            .localCheckpoint()
        )
    return scores


def pagerank_topk(trans: DataFrame, k: int = 20,
                  iters: int = PAGERANK_ITERS) -> DataFrame:
    """Top-k pages by PageRank score, deterministic tie-break on node
    id. TakeOrderedAndProject cut (the tx_bm25_topk lesson: never rank
    an unbounded relation through a global window to cut it)."""
    return (
        pagerank(trans, iters)
        .orderBy(F.desc("score"), F.asc("node"))
        .limit(k)
    )


#: co-edit fanout cap: each user contributes at most this many pages
#: (their most-edited) to pair generation. Sized from the driver data
#: where per-user distinct-page counts are ~45 median / ~90 max at
#: every SF (user count scales with SF, per-user activity does not),
#: so the cap genuinely binds for above-median users at all test SFs.
COEDIT_CAP = 40
COEDIT_TOPK = 25


def coedit_pairs(
    edit_events: DataFrame, cap: int = COEDIT_CAP, k: int = COEDIT_TOPK
) -> DataFrame:
    """Top-k co-edited page pairs: pairs of pages whose HUMAN editor
    sets overlap, scored by the number of shared editors — the
    market-basket / "editors also edit" co-occurrence layer next to the
    transition graph (a pair can co-occur without ever being edited
    back-to-back, which is what edit_transitions measures).

    Scale shape (the canonical bounded co-occurrence plan):
    - per-(user, page) pre-aggregation FIRST (one shuffle on the pair
      key) bounds the window payload below by construction — the
      two-level idiom from page_state;
    - the per-user rank window then carries at most that user's
      distinct-page count, and the cap keeps each user's contribution
      to pair generation at C(cap, 2) pairs REGARDLESS of how
      promiscuous the key is — hot users are truncated to their cap
      most-edited pages (deterministic: edits desc, id asc), not
      exploded quadratically and not dropped entirely;
    - the self-join on user is an equi-join of two cap-bounded
      relations sharing one partitioning; top_pages is
      localCheckpoint'd first so the pre-agg + rank pipeline is
      computed once, not once per join branch (ADVICE r7);
    - final cut: orderBy + limit = TakeOrderedAndProject; the rank
      column is windowed over the k-row relation only (the
      tx_bm25_topk lesson)."""
    ue = (
        edit_events.filter(~F.col("is_bot"))
        .groupBy("user", "id")
        .agg(F.count(F.lit(1)).alias("n_edits"))
    )
    w = Window.partitionBy("user").orderBy(F.desc("n_edits"), F.asc("id"))
    top_pages = (
        ue.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") <= cap)
        .select("user", "id")
        .localCheckpoint()
    )
    pairs = (
        top_pages.alias("a")
        .join(top_pages.alias("b"), "user")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("page_a"), F.col("b.id").alias("page_b")
        )
        .agg(F.count(F.lit(1)).alias("n_coeditors"))
    )
    top = pairs.orderBy(
        F.desc("n_coeditors"), F.asc("page_a"), F.asc("page_b")
    ).limit(k)
    wr = Window.orderBy(F.desc("n_coeditors"), F.asc("page_a"), F.asc("page_b"))
    return top.withColumn("rank", F.row_number().over(wr).cast("int"))
