"""Deterministic text primitives: normalization, sentence split, tokenization.

Reference analogs:
- sentence segmentation: scispacy `.sents` / nltk sent_tokenize
  (rag2-retriever/query_encode.py:17-42, cxmi/cxmi_pruning.py:153) — we use a
  deterministic regex splitter with identical behavior on both sides.
- normalization: upper/strip before regex matching (rag2-generation/metrics.py:11).
"""

from __future__ import annotations

import re

# Split after ., !, ? or ; followed by whitespace. No lookbehind so the same
# pattern is usable in RE2-based engines too if ever needed; we re-attach the
# terminator by splitting on the boundary between terminator and whitespace.
_SENT_BOUNDARY = re.compile(r"(?<=[.!?;])\s+")
_WS = re.compile(r"\s+")
_TOKEN = re.compile(r"[A-Za-z0-9][A-Za-z0-9'\-]*")
_EDGE_PUNCT = re.compile(r"^[^A-Za-z0-9]+|[^A-Za-z0-9]+$")


def normalize_ws(text: str) -> str:
    """Collapse whitespace runs to single spaces and trim."""
    return _WS.sub(" ", text).strip()


def normalize_alias(surface: str) -> str:
    """Canonical alias key: lowercase, trim, collapse whitespace, strip edge
    punctuation per token. Deterministic and reversible enough for joins."""
    toks = [
        _EDGE_PUNCT.sub("", t).lower()
        for t in _WS.split(surface.strip())
    ]
    return " ".join(t for t in toks if t)


def split_sentences(text: str) -> list[str]:
    """Split text into sentences; empty/whitespace-only units are dropped.

    Sentences keep their terminator. A text with no terminator is a single
    sentence. (Reference: [SEP]-join skipped len-1 sentences,
    query_encode.py:29-42 — we keep units with >1 char after strip.)
    """
    if text is None:
        return []
    t = text.strip()
    if not t:
        return []
    parts = [normalize_ws(p) for p in _SENT_BOUNDARY.split(t)]
    return [p for p in parts if len(p) > 1]


def tokenize(sentence: str) -> list[tuple[str, int, int]]:
    """Return (token, start_char, end_char) for word tokens, in order."""
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN.finditer(sentence)]


def char_ngrams(s: str, n: int = 3) -> set[str]:
    """Character n-gram set of the padded normalized string (for fuzzy
    link scoring; reference analog: dense-vector cosine, F9)."""
    s = f"#{normalize_alias(s)}#"
    if len(s) <= n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Jaccard similarity of char n-gram sets; 1.0 for identical keys."""
    ga, gb = char_ngrams(a, n), char_ngrams(b, n)
    if not ga or not gb:
        return 0.0
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter)
