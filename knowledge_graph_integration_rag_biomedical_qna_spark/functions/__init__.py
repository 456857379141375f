"""Reusable column-expression helpers (JVM-side, codegen-friendly)."""

from .columns import alias_key_col, empty_text_filter, sentence_count_col

__all__ = ["alias_key_col", "empty_text_filter", "sentence_count_col"]
