"""The KG-construction plan: transcripts -> kg_nodes + kg_edges.

Shuffle budget of the whole plan (the thing that decides 100 TB viability):

  1 shuffle   stage [1] window over (conv_id, turn_idx)          [data-sized]
  0 shuffles  stages [2]-[3] mapInPandas (inherit partitioning)
  1 tiny      stage [4]-[5] distinct over (alias_key, surface)   [vocab-sized]
  0 shuffles  resolution joins (resolution table is broadcast)
  2 shuffles  stage [6] salted two-phase groupBy                 [mention-count-sized,
              second phase <= |CUI| x S rows]
  1 shuffle   edge-stats groupBy (counter payload, map-side combine)

Everything transcript-sized shuffles at most once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.canonicalize import aggregate_edges, canonicalize_nodes
from ..operators.extraction import detect_mentions_df, extract_triples_df
from ..operators.linking import (
    candidate_table,
    resolution_table,
    resolve_mentions,
    resolve_triples,
)
from ..operators.turn_assembly import assemble_turns


@dataclass
class KGResult:
    turns: DataFrame
    mentions: DataFrame
    raw_triples: DataFrame
    candidates: DataFrame
    resolution: DataFrame
    kg_edges: DataFrame      # evidence-level CUI-resolved triples (provenance kept)
    kg_edge_stats: DataFrame  # deduplicated graph edges with counters
    kg_nodes: DataFrame


def broadcast_alias_keys(spark: SparkSession, aliases: DataFrame):
    """Ship the alias-key set to executors once (dictionary for the matcher).
    At UMLS scale (~16M alias keys) this is a few hundred MB — still broadcast
    territory; beyond that, swap for a bloom-filter pre-pass + join."""
    keys = frozenset(r[0] for r in aliases.select("alias_key").distinct().collect())
    return spark.sparkContext.broadcast(keys)


def build_kg(
    spark: SparkSession,
    transcripts: DataFrame,
    aliases: DataFrame,
    persist: bool = True,
) -> KGResult:
    """Compose stages [1]-[6].

    `persist=True` caches the turn table and the two extraction outputs
    (MEMORY_AND_DISK): both are consumed by multiple downstream branches, and
    without a cache Catalyst re-executes the pandas-UDF extraction once per
    consuming subtree (no cross-branch CSE). For jobs too large to cache,
    use plans.checkpoint.ResumableKGRun, which materializes stage boundaries
    to storage instead (the reference's JSON stage files, done right).
    """
    turns = assemble_turns(transcripts)
    keys_bc = broadcast_alias_keys(spark, aliases)
    if persist:
        turns = turns.persist()
    mentions = detect_mentions_df(turns, keys_bc)
    raw_triples = extract_triples_df(turns, keys_bc)
    if persist:
        mentions = mentions.persist()
        raw_triples = raw_triples.persist()

    # every surface the pipeline saw, in ONE pass over each input (explode,
    # not a 3-way union of re-scans); distinct() collapses duplicates.
    surf = mentions.select("alias_key", "surface").unionByName(
        raw_triples.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("subj_key").alias("alias_key"),
                        F.col("subj_surface").alias("surface"),
                    ),
                    F.struct(
                        F.col("obj_key").alias("alias_key"),
                        F.col("obj_surface").alias("surface"),
                    ),
                )
            ).alias("s")
        ).select("s.alias_key", "s.surface")
    )
    candidates = candidate_table(surf, aliases)
    resolution = resolution_table(candidates)
    if persist:
        resolution = resolution.persist()

    resolved_mentions = resolve_mentions(mentions, resolution)
    kg_edges = resolve_triples(raw_triples, resolution)
    kg_nodes = canonicalize_nodes(resolved_mentions)
    kg_edge_stats = aggregate_edges(kg_edges)
    return KGResult(
        turns=turns,
        mentions=mentions,
        raw_triples=raw_triples,
        candidates=candidates,
        resolution=resolution,
        kg_edges=kg_edges,
        kg_edge_stats=kg_edge_stats,
        kg_nodes=kg_nodes,
    )
