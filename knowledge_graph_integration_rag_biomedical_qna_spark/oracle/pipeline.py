"""Pandas reference pipeline: the semantics the Spark engine must reproduce.

This is the analog of the reference repo's gold-answer metric join
(rag2-generation/metrics.py:23-52): a small, independent implementation of the
same deterministic extraction + linking semantics (shared `core` code, shared
tie-breaks) that the distributed pipeline is measured against at
P/R >= 0.95 on (conv_id, turn_idx, subj_cui, pred, obj_cui).
"""

from __future__ import annotations

import pandas as pd

from ..core.linking import rank_candidates, resolve
from ..core.patterns import detect_mentions, extract_triples
from ..core.text import split_sentences


def oracle_turns(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Stage [1] semantics: stable (conv_id, turn_idx, ts, role) ordering,
    first-wins dedup of duplicate (conv_id, turn_idx), drop empty text."""
    df = transcripts.sort_values(
        ["conv_id", "turn_idx", "ts", "role", "text", "tool"], kind="mergesort"
    ).drop_duplicates(["conv_id", "turn_idx"], keep="first")
    # strip(" ") only: Spark F.trim removes SPACES, so a tab/newline-only
    # text is KEPT by the engine and must be kept here too (r4 review)
    df = df[df["text"].fillna("").str.strip(" ") != ""]
    return df.reset_index(drop=True)


def _alias_index(aliases: pd.DataFrame) -> dict[str, list[tuple[str, str, float]]]:
    """alias_key -> [(cui, alias, prior)] with deterministic candidate order."""
    idx: dict[str, list[tuple[str, str, float]]] = {}
    srt = aliases.sort_values(["alias_key", "cui"], kind="mergesort")
    for key, cui, alias, prior in zip(
        srt["alias_key"], srt["cui"], srt["alias"], srt["prior"]
    ):
        idx.setdefault(key, []).append((cui, alias, float(prior)))
    return idx


def oracle_mentions(turns: pd.DataFrame, aliases: pd.DataFrame) -> pd.DataFrame:
    """Stage [2] semantics: sentence split + dictionary mention detection.
    One row per detected mention with (conv_id, turn_idx, sent_idx, mention_idx)."""
    keys = frozenset(aliases["alias_key"])
    rows = []
    for conv_id, turn_idx, text in zip(turns["conv_id"], turns["turn_idx"], turns["text"]):
        for si, sent in enumerate(split_sentences(text)):
            for mi, m in enumerate(detect_mentions(sent, keys)):
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "sent_idx": si,
                        "mention_idx": mi,
                        "surface": m.surface,
                        "alias_key": m.alias_key,
                        "tok_start": m.tok_start,
                        "tok_end": m.tok_end,
                    }
                )
    return pd.DataFrame(
        rows,
        columns=[
            "conv_id", "turn_idx", "sent_idx", "mention_idx",
            "surface", "alias_key", "tok_start", "tok_end",
        ],
    )


def oracle_triples(turns: pd.DataFrame, aliases: pd.DataFrame) -> pd.DataFrame:
    """Stages [3]-[6] semantics end-to-end: extraction + linking + CUI edges.

    Output: (conv_id, turn_idx, subj_cui, pred, obj_cui, subj_surface,
    obj_surface, confidence) — the FIXTURES.md `expected_triples` schema.
    """
    keys = frozenset(aliases["alias_key"])
    idx = _alias_index(aliases)
    rows = []
    for conv_id, turn_idx, text in zip(turns["conv_id"], turns["turn_idx"], turns["text"]):
        for sent in split_sentences(text):
            for t in extract_triples(sent, keys):
                subj = resolve(t.subj_surface, idx.get(t.subj_key, []))
                obj = resolve(t.obj_surface, idx.get(t.obj_key, []))
                if subj is None or obj is None:
                    continue
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "subj_cui": subj[0],
                        "pred": t.pred,
                        "obj_cui": obj[0],
                        "subj_surface": t.subj_surface,
                        "obj_surface": t.obj_surface,
                        "confidence": t.confidence,
                    }
                )
    return pd.DataFrame(
        rows,
        columns=[
            "conv_id", "turn_idx", "subj_cui", "pred", "obj_cui",
            "subj_surface", "obj_surface", "confidence",
        ],
    )


def oracle_links(mentions: pd.DataFrame, aliases: pd.DataFrame, k: int = 10) -> pd.DataFrame:
    """Stage [4]-[5] semantics in isolation: per-mention top-k candidates."""
    idx = _alias_index(aliases)
    rows = []
    for _, m in mentions.iterrows():
        for rank, (cui, score) in enumerate(
            rank_candidates(m["surface"], idx.get(m["alias_key"], []), k=k), start=1
        ):
            rows.append(
                {
                    "conv_id": m["conv_id"],
                    "turn_idx": int(m["turn_idx"]),
                    "sent_idx": int(m["sent_idx"]),
                    "mention_idx": int(m["mention_idx"]),
                    "surface": m["surface"],
                    "cui": cui,
                    "score": score,
                    "rank": rank,
                }
            )
    return pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "sent_idx", "mention_idx", "surface", "cui", "score", "rank"],
    )


def oracle_nodes(mentions: pd.DataFrame, aliases: pd.DataFrame) -> pd.DataFrame:
    """Stage [6] canonicalization gold: cui -> sorted surface set + count
    over all RESOLVED mentions (FIXTURES.md `expected_nodes`)."""
    idx = _alias_index(aliases)
    resolved = []
    for surface, key in zip(mentions["surface"], mentions["alias_key"]):
        r = resolve(surface, idx.get(key, []))
        if r is not None:
            resolved.append({"cui": r[0], "surface": surface})
    if not resolved:
        return pd.DataFrame(columns=["cui", "surfaces", "mention_count"])
    rdf = pd.DataFrame(resolved)
    out = (
        rdf.groupby("cui")
        .agg(
            surfaces=("surface", lambda s: sorted(set(s))),
            mention_count=("surface", "size"),
        )
        .reset_index()
        .sort_values("cui")
        .reset_index(drop=True)
    )
    out["mention_count"] = out["mention_count"].astype("int64")
    return out
