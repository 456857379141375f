"""Golden-file regression (SURVEY.md §5 item 2): the seed-42 fixture KG
outputs are pinned by content digest, like the reference's checked-in output
JSONs. Any semantic drift in extraction/linking/canonicalization — however
small — fails here even if the Spark/oracle parity still agrees (both could
drift together)."""

from __future__ import annotations

import hashlib

from knowledge_graph_integration_rag_biomedical_qna_spark.oracle.pipeline import (
    oracle_mentions,
    oracle_nodes,
    oracle_triples,
    oracle_turns,
)

GOLDEN_TRIPLES = (1305, "f48d17703d84287bf52cb137da690d1a41f2faf842985f20d75da5d1e68f593b")
GOLDEN_NODES = (295, "fdaec034073a1b302ebd7e34a77899ee4fcfff220e5d27065fb7d8bc5ebf0179")


def _digest(df, cols) -> str:
    rows = sorted(tuple(str(v) for v in r) for r in df[cols].itertuples(index=False))
    return hashlib.sha256("\n".join("|".join(r) for r in rows).encode()).hexdigest()


def test_golden_kg_outputs(tables):
    turns = oracle_turns(tables["transcripts"])
    aliases = tables["concept_aliases"]
    triples = oracle_triples(turns, aliases)
    assert (
        len(triples),
        _digest(
            triples,
            ["conv_id", "turn_idx", "subj_cui", "pred", "obj_cui",
             "subj_surface", "obj_surface", "confidence"],
        ),
    ) == GOLDEN_TRIPLES
    nodes = oracle_nodes(oracle_mentions(turns, aliases), aliases)
    nodes = nodes.assign(surfaces=nodes["surfaces"].map(lambda s: ",".join(s)))
    assert (len(nodes), _digest(nodes, ["cui", "surfaces", "mention_count"])) == GOLDEN_NODES
