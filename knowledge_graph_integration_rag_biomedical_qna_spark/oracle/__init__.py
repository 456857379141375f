"""Pure-pandas reference implementation (the P/R >= 0.95 oracle)."""

from .pipeline import oracle_mentions, oracle_nodes, oracle_triples, oracle_turns

__all__ = ["oracle_turns", "oracle_mentions", "oracle_triples", "oracle_nodes"]
