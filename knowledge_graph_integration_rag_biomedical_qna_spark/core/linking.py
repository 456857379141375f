"""Entity-link candidate scoring + deterministic top-k selection.

Reference shape being kept (see SURVEY.md §2.3/§2.5):
- candidate generation = dictionary lookup (FAISS top-k analog,
  rag2-retriever/main.py:119-167)
- scoring = similarity x prior blend (cross-encoder rerank analog,
  rag2-retriever/rerank.py:37-75)
- selection = top-k then top-1 with fixed tie-breaks (rerank.py:66-74 argsort)
- acceptance floor = 0.5 (similarity_pruning/context_pruning.py:13)

score(mention, candidate) = SIM_WEIGHT * ngram_jaccard(surface, alias)
                          + PRIOR_WEIGHT * prior
Ties broken by (score desc, prior desc, cui asc) — FAISS returns ties in index
order; we pin an explicit deterministic order instead (SURVEY.md §4 item 2).
"""

from __future__ import annotations

from .config import LINK_ACCEPT_FLOOR, PRIOR_WEIGHT, SIM_WEIGHT, TOP_K_CANDIDATES
from .text import ngram_jaccard


def link_score(surface: str, alias: str, prior: float) -> float:
    """Blend of string similarity and alias->CUI prior, rounded for stable
    cross-engine comparison."""
    return round(SIM_WEIGHT * ngram_jaccard(surface, alias) + PRIOR_WEIGHT * prior, 6)


def rank_candidates(
    surface: str,
    candidates: "list[tuple[str, str, float]]",
    k: int = TOP_K_CANDIDATES,
) -> "list[tuple[str, float]]":
    """candidates: (cui, alias, prior) for one mention's alias_key.
    Returns up to k (cui, score), best first, deterministic tie-breaks."""
    scored = [(cui, link_score(surface, alias, prior), prior) for cui, alias, prior in candidates]
    scored.sort(key=lambda t: (-t[1], -t[2], t[0]))
    return [(cui, s) for cui, s, _ in scored[:k]]


def resolve(
    surface: str,
    candidates: "list[tuple[str, str, float]]",
) -> "tuple[str, float] | None":
    """Top-1 accepted link, or None if best score < LINK_ACCEPT_FLOOR."""
    ranked = rank_candidates(surface, candidates, k=1)
    if not ranked or ranked[0][1] < LINK_ACCEPT_FLOOR:
        return None
    return ranked[0]
