"""Query-side retrieval over the constructed KG.

The reference's runtime use is: question -> retrieve evidence -> rerank ->
top-k (rag2-retriever/main.py). Against the constructed graph that becomes:

  questions(question_id, text)
    -> mention detection over question text (same extractor as ingestion)
    -> entity linking (same resolution semantics)
    -> join kg_edge_stats on either endpoint CUI (1-hop neighborhood)
    -> score = evidence-weighted link score, per-question top-k window

Batch-oriented: a million questions retrieve in one job; a single question is
the degenerate one-row case. Edge stats are the small side ONLY when the
graph is small — the join is keyed on CUI, so at 10^12-turn scale it is a
shuffle join on (cui) with AQE skew handling; questions-side broadcast is
chosen automatically when the question batch is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.extraction import detect_mentions_df
from ..operators.linking import candidate_table, resolution_table


def link_questions(
    spark: SparkSession, questions: DataFrame, aliases: DataFrame, keys_bc
) -> DataFrame:
    """questions(question_id, text) -> (question_id, cui, link_score).

    question_id keeps its INPUT type: the id rides the extractor as a string
    conv_id, then joins back to the questions table to restore the original
    column (r4 review: returning the stringified id made the gated output
    string-typed against an int32 oracle, and string ordering diverges from
    numeric past 9 questions). The per-question mention table is persisted:
    it feeds both candidate generation and the resolution join, and without
    a cache the mapInArrow extraction subtree re-executes per consumer (the
    same no-cross-branch-CSE behavior build_kg persists `unified` for) —
    with `spark.sql.shuffle.partitions`-scoped scoring parallelism via
    session.default_parallelism."""
    from ..session import default_parallelism

    turns_like = questions.select(
        F.col("question_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("text"),
    )
    mentions = detect_mentions_df(turns_like, keys_bc).persist()
    try:
        resolution = resolution_table(
            candidate_table(
                mentions.select("alias_key", "surface"), aliases,
                score_partitions=default_parallelism(spark) // 16 or 1,
            )
        )
        qid = questions.select(
            F.col("question_id").cast("string").alias("conv_id"),
            F.col("question_id"),
        ).distinct()
        linked = (
            mentions.join(F.broadcast(resolution), ["alias_key", "surface"])
            .join(F.broadcast(qid), "conv_id")
            .select(
                "question_id",
                "cui",
                F.col("score").alias("link_score"),
            )
            .distinct()
        )
        # materialize the (question-sized) link table eagerly, then release
        # the mentions cache — the previous shape persisted mentions for the
        # session lifetime (r4 advice: leaked cache blocks per invocation).
        # localCheckpoint blocks are ContextCleaner-collected once the
        # returned DataFrame goes out of scope, unlike a CacheManager entry.
        return linked.localCheckpoint(eager=True)
    finally:
        mentions.unpersist()


def neighborhood(kg_edge_stats: DataFrame, seeds: DataFrame, hops: int = 1, k: int = 50) -> DataFrame:
    """Per-seed subgraph fetch over the deduplicated edge view (the `kg query
    neighbors` CLI surface; reference analog: the retriever's per-query
    evidence fan-in, rag2-retriever/main.py:119-167).

    seeds(seed_cui) -> (seed_cui, hop, subj_cui, pred, obj_cui, n_evidence,
    rank): hop 1 = edges incident to the seed, hop 2 = edges incident to the
    1-hop frontier; an edge reachable at both keeps hop 1. Ranked per seed by
    (hop asc, n_evidence desc, endpoint tie-break), top-k per seed. Seeds are
    broadcast (query-sized); the frontier join is left unhinted — AQE
    broadcasts it while small and shuffles on cui when a hub seed explodes
    the frontier."""
    e = kg_edge_stats.select("subj_cui", "pred", "obj_cui", "n_evidence")
    s = F.broadcast(seeds.select("seed_cui").distinct())
    h1 = (
        e.join(s, e.subj_cui == s.seed_cui)
        .unionByName(e.join(s, e.obj_cui == s.seed_cui))
        .select("seed_cui", "subj_cui", "pred", "obj_cui", "n_evidence")
        .distinct()
        .withColumn("hop", F.lit(1))
    )
    out = h1
    if hops >= 2:
        frontier = (
            h1.select("seed_cui", F.col("subj_cui").alias("cui"))
            .unionByName(h1.select("seed_cui", F.col("obj_cui").alias("cui")))
            .filter(F.col("cui") != F.col("seed_cui"))
            .distinct()
        )
        h2 = (
            e.join(frontier, e.subj_cui == frontier.cui)
            .unionByName(e.join(frontier, e.obj_cui == frontier.cui))
            .select("seed_cui", "subj_cui", "pred", "obj_cui", "n_evidence")
            .distinct()
            .withColumn("hop", F.lit(2))
        )
        out = (
            h1.unionByName(h2)
            .groupBy("seed_cui", "subj_cui", "pred", "obj_cui", "n_evidence")
            .agg(F.min("hop").alias("hop"))
        )
    w = Window.partitionBy("seed_cui").orderBy(
        F.col("hop").asc(), F.col("n_evidence").desc(),
        "subj_cui", "pred", "obj_cui",
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("seed_cui", F.col("hop").cast("int").alias("hop"),
                "subj_cui", "pred", "obj_cui", "n_evidence", "rank")
    )


def retrieve_evidence(
    question_links: DataFrame,
    kg_edge_stats: DataFrame,
    k: int = 10,
) -> DataFrame:
    """1-hop evidence edges per question, ranked by evidence-weighted score.

    rank_score_micro = round(link_score * avg_confidence * ln(1 + n_evidence)
    * 1e6) as BIGINT — integer micro-units, not a raw double: the product of
    two quantized doubles times a libm log1p differs between JVM and numpy in
    the last ulp, and round(x, 6) of two almost-equal doubles is not
    bit-identical even when it prints identically at 9 dp (the r3 driver-hash
    failure). The integer removes the REPRESENTATION hazard entirely; the
    residual risk is a genuine cross-engine half-boundary crossing (the
    product landing within ~1 ulp of N.5 micro-units, probability ~2^-40 per
    row) — inherent to any quantization of a libm-bearing expression, and
    strictly smaller than the float column's combined hazards. Ties pinned
    on (subj_cui, pred, obj_cui). Top-k via per-question window (T1).
    """
    subj_hits = kg_edge_stats.join(
        question_links.withColumnRenamed("cui", "subj_cui"), "subj_cui"
    )
    obj_hits = kg_edge_stats.join(
        question_links.withColumnRenamed("cui", "obj_cui"), "obj_cui"
    )
    hits = subj_hits.unionByName(obj_hits).groupBy(
        "question_id", "subj_cui", "pred", "obj_cui", "n_evidence", "avg_confidence"
    ).agg(F.max("link_score").alias("link_score"))
    scored = hits.withColumn(
        "rank_score_micro",
        F.round(
            F.col("link_score") * F.col("avg_confidence")
            * F.log1p(F.col("n_evidence")) * F.lit(1e6)
        ).cast("bigint"),
    )
    w = Window.partitionBy("question_id").orderBy(
        F.col("rank_score_micro").desc(), F.col("subj_cui"), F.col("pred"), F.col("obj_cui")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(
            "question_id", "subj_cui", "pred", "obj_cui",
            "n_evidence", "rank_score_micro", "rank",
        )
    )
