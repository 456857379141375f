"""Bucketed-table co-location: with broadcast disabled, a self-join and a
groupBy on the bucket key must plan with ZERO shuffle exchanges — the
storage-layout shuffle amortization the 100 TB design leans on (write the
transcripts table bucketed by conv_id once; every downstream join/agg on
conv_id skips its exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_graph_integration_rag_biomedical_qna_spark.sources.io import write_bucketed


def test_bucketed_join_has_no_shuffle(spark, fixture_dir):
    transcripts = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    write_bucketed(transcripts, "transcripts_bucketed", "conv_id", 8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t = spark.table("transcripts_bucketed")
        per_conv = t.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
        joined = t.join(per_conv, "conv_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan
        assert joined.count() == transcripts.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS transcripts_bucketed")


def test_turn_assembly_zero_shuffle_on_bucketed_input(spark, fixture_dir):
    """Stage [1] on a bucketed transcripts table with assume_clustered=True:
    the whole dedup window runs with zero exchanges."""
    from knowledge_graph_integration_rag_biomedical_qna_spark.operators.turn_assembly import (
        assemble_turns,
    )

    transcripts = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    write_bucketed(transcripts, "transcripts_bucketed2", "conv_id", 8)
    try:
        t = spark.table("transcripts_bucketed2")
        turns = assemble_turns(t, assume_clustered=True)
        plan = turns._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # same rows as the shuffling path
        assert turns.count() == assemble_turns(transcripts).count()
    finally:
        spark.sql("DROP TABLE IF EXISTS transcripts_bucketed2")


def test_build_kg_bucketed_equals_shuffled(spark, fixture_dir):
    """build_kg(assume_clustered=True) over a bucketed transcripts table:
    zero data-sized exchanges before extraction AND edge-for-edge identical
    output to the shuffling path."""
    from knowledge_graph_integration_rag_biomedical_qna_spark.plans.pipeline import build_kg
    from knowledge_graph_integration_rag_biomedical_qna_spark.sources.synth import (
        synth_aliases,
        synth_transcripts,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    transcripts = synth_transcripts(docs)
    aliases = synth_aliases(spark)
    write_bucketed(transcripts, "transcripts_bucketed3", "conv_id", 8)
    try:
        bt = spark.table("transcripts_bucketed3")
        kg_b = build_kg(spark, bt, aliases, persist=False, assume_clustered=True)
        kg_s = build_kg(spark, transcripts, aliases, persist=False)
        cols = ["conv_id", "turn_idx", "subj_cui", "pred", "obj_cui", "confidence"]
        a = sorted(map(tuple, kg_b.kg_edges.select(cols).collect()))
        b = sorted(map(tuple, kg_s.kg_edges.select(cols).collect()))
        assert a == b and len(a) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS transcripts_bucketed3")


def test_write_bucketed_one_file_per_bucket(spark, fixture_dir):
    """The r3 bench regression guard: writing from a many-partition DataFrame
    must NOT emit tasks x buckets tiny files (1,024 at bench scale — the
    serial per-bucket read cost more than the exchange bucketing saved).
    write_bucketed repartitions by the bucket column first, so exactly one
    data file per bucket lands on disk."""
    import glob
    import os

    transcripts = spark.read.parquet(f"{fixture_dir}/transcripts.parquet").repartition(16)
    write_bucketed(transcripts, "transcripts_bucketed_files", "conv_id", 8)
    try:
        loc = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"),
            "transcripts_bucketed_files",
        )
        files = glob.glob(os.path.join(loc, "part-*.parquet"))
        assert len(files) == 8, sorted(os.path.basename(f) for f in files)
        assert spark.table("transcripts_bucketed_files").count() == transcripts.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS transcripts_bucketed_files")
