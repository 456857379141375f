"""Structured Streaming ingest test: file-source micro-batches produce the
same evidence-level edges as the batch pipeline, with duplicate turns dropped
by the watermark+dropDuplicates stage."""

from __future__ import annotations

import pandas as pd

from knowledge_graph_integration_rag_biomedical_qna_spark.plans.pipeline import (
    broadcast_alias_keys,
    build_kg,
)
from knowledge_graph_integration_rag_biomedical_qna_spark.streaming.ingest import (
    start_kg_stream,
)

TRIPLE_KEY = ["conv_id", "turn_idx", "subj_cui", "pred", "obj_cui"]


def test_stream_matches_batch(spark, fixture_dir, tables, tmp_path):
    # stage the transcripts as multiple files to force several micro-batches,
    # and append a duplicate copy of some turns (at-least-once delivery)
    src = tmp_path / "stream_src"
    src.mkdir()
    t = tables["transcripts"]
    third = len(t) // 3
    t.iloc[:third].to_parquet(src / "part-0.parquet", index=False)
    t.iloc[third : 2 * third].to_parquet(src / "part-1.parquet", index=False)
    t.iloc[2 * third :].to_parquet(src / "part-2.parquet", index=False)
    # duplicates of the first 50 turns arrive again in a later file
    t.iloc[:50].to_parquet(src / "part-3-dupes.parquet", index=False)

    aliases = spark.read.parquet(f"{fixture_dir}/concept_aliases.parquet")
    keys_bc = broadcast_alias_keys(spark, aliases)
    out = str(tmp_path / "stream_out")
    q = start_kg_stream(spark, str(src), out, aliases, keys_bc, trigger_available_now=True)
    q.awaitTermination(timeout=300)

    got = (
        spark.read.parquet(f"{out}/kg_edges_stream")
        .drop("epoch")
        .toPandas()
        .drop_duplicates()  # dupes across epochs impossible; belt and braces
        .sort_values(TRIPLE_KEY + ["subj_surface", "obj_surface"])
        .reset_index(drop=True)
    )

    transcripts = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    want = (
        build_kg(spark, transcripts, aliases)
        .kg_edges.toPandas()
        .sort_values(TRIPLE_KEY + ["subj_surface", "obj_surface"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[TRIPLE_KEY].reset_index(drop=True), want[TRIPLE_KEY].reset_index(drop=True)
    )


def test_stateful_conversation_progress(spark, tables, tmp_path):
    """applyInPandasWithState: per-conversation turn counters accumulate
    across micro-batches and match the batch ground truth."""
    from knowledge_graph_integration_rag_biomedical_qna_spark.streaming.stateful import (
        conversation_progress,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.sources.io import (
        TRANSCRIPTS_SCHEMA,
    )

    src = tmp_path / "state_src"
    src.mkdir()
    t = tables["transcripts"]
    half = len(t) // 2
    t.iloc[:half].to_parquet(src / "p0.parquet", index=False)
    t.iloc[half:].to_parquet(src / "p1.parquet", index=False)

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        conversation_progress(stream)
        .writeStream.format("memory")
        .queryName("conv_progress")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)

    got = spark.sql(
        """SELECT conv_id, max(n_turns) AS n_turns, max(max_turn_idx) AS max_turn_idx
           FROM conv_progress GROUP BY conv_id"""
    ).toPandas().set_index("conv_id")
    want = t.groupby("conv_id").agg(n_turns=("turn_idx", "size"), max_turn_idx=("turn_idx", "max"))
    assert len(got) == len(want)
    for conv_id, row in want.iterrows():
        assert got.loc[conv_id, "n_turns"] == row["n_turns"], conv_id
        assert got.loc[conv_id, "max_turn_idx"] == row["max_turn_idx"], conv_id


def test_streaming_windowed_counts_match_batch(spark, tables, tmp_path):
    """Watermarked tumbling-window aggregate over the turn stream matches the
    batch groupBy on the same data (append mode, availableNow drain)."""
    from knowledge_graph_integration_rag_biomedical_qna_spark.sources.io import (
        TRANSCRIPTS_SCHEMA,
    )
    from pyspark.sql import functions as F

    src = tmp_path / "win_src"
    src.mkdir()
    t = tables["transcripts"]
    t.iloc[: len(t) // 2].to_parquet(src / "p0.parquet", index=False)
    t.iloc[len(t) // 2 :].to_parquet(src / "p1.parquet", index=False)

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk_win"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)

    got = spark.sql(
        "SELECT w.start AS ws, role, n FROM win_counts"
    ).toPandas()
    batch = spark.createDataFrame(t)
    want = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "role", "n")
        .toPandas()
    )
    # append mode emits only watermark-closed windows; every emitted row must
    # match the batch result exactly, and most windows should have closed
    got_map = {(r["ws"], r["role"]): r["n"] for _, r in got.iterrows()}
    want_map = {(r["ws"], r["role"]): r["n"] for _, r in want.iterrows()}
    assert got_map, "no windows closed"
    for k, v in got_map.items():
        assert want_map.get(k) == v, k
    assert len(got_map) >= len(want_map) * 0.5
