"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship KG-construction run on /root/testdata/sf0.001 —
  synthesizes a deterministic transcripts table from documents.parquet and
  runs the full pipeline (turn assembly -> mention detection -> triple
  extraction -> entity linking -> canonicalized edges).
- ``queries()``: one callable per implemented operator from SURVEY.md §2 plus
  the training-data ops (dedup / ANN / text analysis / multimodal), registered
  in knowledge_graph_integration_rag_biomedical_qna_spark.entry_queries.
- ``oracle_sql()``: the DuckDB twin for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from knowledge_graph_integration_rag_biomedical_qna_spark.entry_queries import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses the oracle-free variant: the registry wrapper refreshes the
    materialized oracle for ITS sf_dir, and this smoke run at sf0.001 must
    not overwrite the sf0.01 oracle the correctness gate reads."""
    fn, _ = REGISTRY["kg_pipeline_full"]
    return getattr(fn, "__wrapped__", fn)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query.

    Some oracles read MATERIALIZED independent results (pandas/numpy
    re-derivations, see oracle/materialize.py). Refresh them here for the
    driver's correctness scale so the files are current no matter whether the
    Spark queries or the oracle SQL run first."""
    try:
        from knowledge_graph_integration_rag_biomedical_qna_spark.oracle.materialize import materialize_all

        materialize_all("/root/testdata/sf0.01")
    except Exception as exc:
        import warnings

        # committed data/oracle/current/sf0.01/*.parquet is the cold-start
        # fallback, but a refresh failure is worth hearing about
        warnings.warn(f"oracle materialize_all failed: {exc!r}")
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
