"""Source tests: tolerant JSONL ingestion + table IO abstraction."""

from __future__ import annotations

from knowledge_graph_integration_rag_biomedical_qna_spark.sources.io import TableIO
from knowledge_graph_integration_rag_biomedical_qna_spark.sources.jsonl import (
    read_transcripts_jsonl,
)


def test_jsonl_permissive_ingest(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    lines = [
        '{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello.", "tool": "", "ts": "2026-01-01T00:00:00"}',
        '{"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "hi.", "tool": "", "ts": "2026-01-01T00:00:01"}',
        "this is not json at all {{{",
        '{"conv_id": null, "turn_idx": 5, "text": "orphan"}',
        '{"conv_id": "c2", "turn_idx": 0, "text": "minimal"}',
    ]
    p.write_text("\n".join(lines))
    good, bad = read_transcripts_jsonl(spark, str(p))
    g = good.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(g) == 3
    # defaults filled for the minimal record
    row = g[g["conv_id"] == "c2"].iloc[0]
    assert row["role"] == "user" and row["tool"] == ""
    assert bad.count() == 2


def test_table_io_replace_roundtrip(spark, tmp_path):
    io = TableIO(spark, str(tmp_path))
    assert not io.iceberg  # no Iceberg runtime in this image -> parquet mode
    df = spark.range(10).withColumnRenamed("id", "x")
    io.replace(df, "t1")
    assert io.exists("t1")
    assert io.read("t1").count() == 10
    # replace is atomic create-or-replace
    io.replace(spark.range(3).withColumnRenamed("id", "x"), "t1")
    assert io.read("t1").count() == 3
    io.append(spark.range(2).withColumnRenamed("id", "x"), "t1")
    assert io.read("t1").count() == 5


def test_json_array_scan(spark, tmp_path):
    from knowledge_graph_integration_rag_biomedical_qna_spark.sources.jsonl import (
        read_json_array,
    )

    p = tmp_path / "arr.json"
    p.write_text('[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]')
    df = read_json_array(spark, str(p))
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [(1, "x"), (2, "y")]
