"""Column-expression twins of the core pure-Python semantics.

These keep simple normalizations in whole-stage codegen (no Python) for plans
that only need the cheap part — e.g. pre-filtering rows by alias-key presence
before shipping text to the pandas extraction UDF. Semantics mirror
core.text (the UDF path stays the source of truth; parity is pytest-checked).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def alias_key_col(col: str | Column) -> Column:
    """JVM twin of core.text.normalize_alias for single-token surfaces:
    lower, trim, strip leading/trailing non-alphanumerics, collapse spaces."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.trim(c))
    c = F.regexp_replace(c, r"^[^a-z0-9]+|[^a-z0-9]+$", "")
    return F.regexp_replace(c, r"\s+", " ")


def empty_text_filter(col: str | Column = "text") -> Column:
    """P1 predicate: non-empty after trim (empty_abstract_filter.py:94-101)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.coalesce(c, F.lit(""))) != ""


def sentence_count_col(col: str | Column = "text") -> Column:
    """Approximate sentence count (terminator runs + trailing fragment) —
    used for metrics/lineage, not extraction (which splits in Python)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(F.trim(c), r"(?<=[.!?;])\s+"), lambda s: F.length(s) > 1))
