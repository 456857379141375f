"""Shared pytest fixtures: one local SparkSession + seed-42 synthetic tables."""

from __future__ import annotations

import pandas as pd
import pytest

from knowledge_graph_integration_rag_biomedical_qna_spark.fixtures.gen import generate_all
from knowledge_graph_integration_rag_biomedical_qna_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kg_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("fixtures")
    generate_all(str(d), n_conv=200)
    return str(d)


@pytest.fixture(scope="session")
def tables(fixture_dir) -> dict[str, pd.DataFrame]:
    return {
        "transcripts": pd.read_parquet(f"{fixture_dir}/transcripts.parquet"),
        "concepts": pd.read_parquet(f"{fixture_dir}/concepts.parquet"),
        "concept_aliases": pd.read_parquet(f"{fixture_dir}/concept_aliases.parquet"),
    }
