"""Vectorized featurization: hashed char-n-gram embeddings (M1/M2 analog).

The reference encodes queries/articles with MedCPT transformers
(rag2-retriever/query_encode.py:51-78, context_pruning.py:53-68). Offline we
substitute a deterministic hashing-trick vectorizer with the same dataflow:
`str -> float32[dim]` inside an Arrow-batched pandas UDF (numpy-vectorized,
no per-row Python hashing in the hot loop), L2-normalized so downstream
cosine is a dot product. Pair scoring (M3 cross-encoder analog) is the dot
product of the two embeddings — computed either JVM-side (zip_with) or in the
same UDF family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64
_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


def _hash_ngrams(text: str, n: int = 3) -> np.ndarray:
    """FNV-1a over byte n-grams, vectorized with numpy sliding windows."""
    b = np.frombuffer(f"#{text.strip().lower()}#".encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < n:
        b = np.pad(b, (0, n - len(b)), constant_values=35)  # '#'
    windows = np.lib.stride_tricks.sliding_window_view(b, n).astype(np.uint64)
    h = np.full(len(windows), _FNV_OFFSET, dtype=np.uint64)
    for k in range(n):
        h = (h ^ windows[:, k]) * _FNV_PRIME
    return h


def embed_text(text: str, dim: int = DEFAULT_DIM, n: int = 3) -> np.ndarray:
    """Deterministic hashed n-gram embedding, L2-normalized float32[dim]."""
    h = _hash_ngrams(text or "", n)
    idx = (h % np.uint64(dim)).astype(np.int64)
    sign = np.where((h >> np.uint64(32)) & np.uint64(1), 1.0, -1.0)
    v = np.zeros(dim, dtype=np.float64)
    np.add.at(v, idx, sign)
    nrm = np.linalg.norm(v)
    if nrm > 0:
        v /= nrm
    return v.astype(np.float32)


def embed_udf(dim: int = DEFAULT_DIM, n: int = 3):
    """pandas UDF: Series[str] -> Series[array<float>] (Arrow-batched)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_text(t, dim, n).tolist())

    return _embed


def with_embedding(df: DataFrame, text_col: str = "text", out_col: str = "embedding",
                   dim: int = DEFAULT_DIM) -> DataFrame:
    return df.withColumn(out_col, embed_udf(dim)(F.col(text_col)))


def cosine_col(a: str | Column, b: str | Column) -> Column:
    """JVM-side cosine of two (already-normalized) embedding columns."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    da = F.transform(ca, lambda x: x.cast("double"))
    db = F.transform(cb, lambda x: x.cast("double"))
    return F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
