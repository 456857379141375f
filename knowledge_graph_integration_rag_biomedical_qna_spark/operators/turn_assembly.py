"""Stage [1] — turn assembly under a stable per-conversation ordering.

Contract (BASELINE.json): per-turn text equality under stable
(conv_id, turn_idx) ordering. Ordering inside a turn-key collision is pinned to
(ts, role, text, tool) — never partition order — so duplicate (conv_id,
turn_idx) rows (late re-sends, at-least-once ingest) dedup deterministically
first-wins, exactly like the oracle's stable sort + drop_duplicates.

Reference analogs: empty-text drop = empty-abstract filter
(rag2-retriever/empty_abstract_filter.py:94-101); first-seen dedup = the
seen-set dedup (similarity_pruning/context_pruning.py:78-85).

Scale notes: the single window shuffle partitions by conv_id — the same
partitioning every downstream per-turn stage reuses (no further shuffle until
canonicalization). Conversation-length skew is bounded: the window only ranks
within (conv_id, turn_idx) groups, which are tiny regardless of conversation
length, and AQE splits skewed shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_ORDER = ["ts", "role", "text", "tool"]


def assemble_turns(transcripts: DataFrame) -> DataFrame:
    """Dedup duplicate (conv_id, turn_idx) first-wins under the stable order,
    drop empty/whitespace-only texts, and keep the contract columns."""
    w = Window.partitionBy("conv_id", "turn_idx").orderBy(
        *[F.col(c).asc_nulls_last() for c in TURN_ORDER]
    )
    return (
        transcripts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .filter(F.trim(F.coalesce(F.col("text"), F.lit(""))) != "")
    )
