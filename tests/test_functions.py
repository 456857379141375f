"""Tests for the column-expression helpers (functions/columns.py): their JVM
semantics must match the core pure-Python twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_graph_integration_rag_biomedical_qna_spark.core.text import (
    normalize_alias,
    split_sentences,
)
from knowledge_graph_integration_rag_biomedical_qna_spark.functions import (
    alias_key_col,
    empty_text_filter,
    sentence_count_col,
)


def test_alias_key_col_matches_core(spark):
    cases = ["  Aspirin ", "BETA Blocker", "(aspirin),", "x", "", "a-b"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r[0] for r in df.select(alias_key_col("s")).collect()]
    want = [normalize_alias(c) for c in cases]
    assert got == want


def test_empty_text_filter(spark):
    df = spark.createDataFrame([("x",), ("",), ("   ",), (None,)], "t string")
    kept = df.filter(empty_text_filter("t")).collect()
    assert [r["t"] for r in kept] == ["x"]


def test_sentence_count_matches_core(spark):
    cases = [
        "a b. c d! e f? g h",
        "one sentence no terminator",
        "! real sentence here.",
        "x",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r[0] for r in df.select(sentence_count_col("t")).collect()]
    want = [len(split_sentences(c)) for c in cases]
    assert got == want
