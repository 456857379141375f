"""Kill-and-resume test (SURVEY.md §5): run the checkpointed materialization,
abort after m of n bucket groups, resume, and require the final tables to be
identical to a single-shot run. Also checks lineage metrics coverage."""

from __future__ import annotations

import pandas as pd
import pytest

from knowledge_graph_integration_rag_biomedical_qna_spark.plans.checkpoint import (
    ResumableKGRun,
)

TRIPLE_KEY = ["conv_id", "turn_idx", "subj_cui", "pred", "obj_cui"]


def _edges(spark, out_dir) -> pd.DataFrame:
    return (
        spark.read.parquet(f"{out_dir}/kg_edges")
        .drop("bucket")
        .toPandas()
        .sort_values(TRIPLE_KEY + ["subj_surface", "obj_surface"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def inputs(spark, fixture_dir):
    return (
        spark.read.parquet(f"{fixture_dir}/transcripts.parquet"),
        spark.read.parquet(f"{fixture_dir}/concept_aliases.parquet"),
    )


def test_resume_produces_identical_tables(spark, inputs, tmp_path):
    transcripts, aliases = inputs
    single = str(tmp_path / "single")
    resumed = str(tmp_path / "resumed")

    # single-shot run
    run1 = ResumableKGRun(spark, single, buckets=8, group_size=2)
    s = run1.run(transcripts, aliases)
    assert s["complete"]
    run1.finalize()

    # crashed run: only 2 of 4 groups committed
    run2 = ResumableKGRun(spark, resumed, buckets=8, group_size=2)
    s1 = run2.run(transcripts, aliases, max_groups=2)
    assert not s1["complete"] and len(s1["buckets_done"]) == 4

    # resume: picks up exactly the remaining buckets
    s2 = ResumableKGRun(spark, resumed, buckets=8, group_size=2).run(transcripts, aliases)
    assert s2["complete"]
    ResumableKGRun(spark, resumed, buckets=8, group_size=2).finalize()

    e1, e2 = _edges(spark, single), _edges(spark, resumed)
    pd.testing.assert_frame_equal(e1, e2)

    n1 = spark.read.parquet(f"{single}/kg_nodes").toPandas().sort_values("cui").reset_index(drop=True)
    n2 = spark.read.parquet(f"{resumed}/kg_nodes").toPandas().sort_values("cui").reset_index(drop=True)
    assert n1["cui"].tolist() == n2["cui"].tolist()
    assert n1["mention_count"].tolist() == n2["mention_count"].tolist()

    # rerun on a complete output is a no-op
    s3 = ResumableKGRun(spark, resumed, buckets=8, group_size=2).run(transcripts, aliases)
    assert s3["groups_processed"] == 0 and s3["complete"]


def test_lineage_metrics(spark, inputs, tmp_path):
    transcripts, aliases = inputs
    out = str(tmp_path / "lineage_run")
    run = ResumableKGRun(spark, out, buckets=4, group_size=4)
    run.run(transcripts, aliases)
    lineage = spark.read.parquet(f"{out}/lineage").toPandas()
    assert sorted(lineage["bucket"].unique()) == [0, 1, 2, 3]
    assert (lineage["turns_in"] > 0).all()
    assert lineage["edges"].sum() > 0
    # triple-count conservation: lineage edge counts == materialized edges
    edges = spark.read.parquet(f"{out}/kg_edges")
    assert int(lineage["edges"].sum()) == edges.count()


def test_legacy_root_lineage_migrates_cleanly(spark, inputs, tmp_path):
    """r4 advice: lineage was a plain append (root part-files) through r3 and
    is commit_group-partitioned since r4 — resuming a pre-upgrade out_dir
    mixed both layouts in one path and broke partition discovery. The run()
    entry must move root-level files under commit_group=legacy so old rows
    keep reading alongside new ones."""
    import os

    transcripts, aliases = inputs
    out = str(tmp_path / "legacy_dir")
    lineage = os.path.join(out, "lineage")
    os.makedirs(lineage, exist_ok=True)
    # simulate a pre-upgrade append: one root-level parquet data file with
    # the lineage row schema minus the partition column
    legacy_rows = pd.DataFrame(
        {
            "bucket": pd.array([0], dtype="int32"),
            "turns_in": pd.array([7], dtype="int64"),
            "mentions": pd.array([3], dtype="int64"),
            "raw_triples": pd.array([1], dtype="int64"),
            "edges": pd.array([1], dtype="int64"),
            "wall_sec": [0.5],
            "committed_at": pd.array(
                [pd.Timestamp("2026-01-01")], dtype="datetime64[us]"
            ),
        }
    )
    legacy_rows.to_parquet(os.path.join(lineage, "part-00000-legacy.parquet"))

    run = ResumableKGRun(spark, out, buckets=4, group_size=2)
    s = run.run(transcripts, aliases)
    assert s["complete"]
    # partition discovery must succeed and see BOTH generations
    got = spark.read.parquet(lineage)
    groups = {r["commit_group"] for r in got.select("commit_group").distinct().collect()}
    assert "legacy" in groups and len(groups) >= 2, groups
    assert got.filter("commit_group = 'legacy'").count() == 1
    # idempotent: a second run() must not disturb the migrated layout
    run.run(transcripts, aliases)
    assert spark.read.parquet(lineage).filter("commit_group = 'legacy'").count() == 1
