"""The correctness gate: Spark pipeline vs pandas oracle on seed-42 fixtures.

BASELINE.json targets enforced here:
- triple P/R >= 0.95 on (conv_id, turn_idx, subj_cui, pred, obj_cui)
  (by construction of shared semantics we expect exactly 1.0)
- per-turn text equality under stable (conv_id, turn_idx) ordering
- canonicalization node parity
"""

from __future__ import annotations

import pandas as pd
import pytest

from knowledge_graph_integration_rag_biomedical_qna_spark.oracle.pipeline import (
    oracle_mentions,
    oracle_nodes,
    oracle_triples,
    oracle_turns,
)
from knowledge_graph_integration_rag_biomedical_qna_spark.plans.pipeline import build_kg

TRIPLE_KEY = ["conv_id", "turn_idx", "subj_cui", "pred", "obj_cui"]


@pytest.fixture(scope="module")
def kg(spark, fixture_dir):
    transcripts = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    aliases = spark.read.parquet(f"{fixture_dir}/concept_aliases.parquet")
    return build_kg(spark, transcripts, aliases)


@pytest.fixture(scope="module")
def gold(tables):
    turns = oracle_turns(tables["transcripts"])
    aliases = tables["concept_aliases"]
    return {
        "turns": turns,
        "mentions": oracle_mentions(turns, aliases),
        "triples": oracle_triples(turns, aliases),
    }


def _pr(pred: pd.DataFrame, gold: pd.DataFrame, key: list[str]) -> tuple[float, float]:
    p = set(map(tuple, pred[key].itertuples(index=False)))
    g = set(map(tuple, gold[key].itertuples(index=False)))
    if not p or not g:
        return (0.0, 0.0)
    inter = len(p & g)
    return inter / len(p), inter / len(g)


def test_turn_text_equality(kg, gold):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering."""
    got = (
        kg.turns.select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = gold["turns"][["conv_id", "turn_idx", "text"]].sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_mention_parity(kg, gold):
    got = kg.mentions.toPandas()
    key = ["conv_id", "turn_idx", "sent_idx", "mention_idx", "alias_key", "surface"]
    prec, rec = _pr(got, gold["mentions"], key)
    assert prec == 1.0 and rec == 1.0, (prec, rec, len(got), len(gold["mentions"]))


def test_triple_pr_gate(kg, gold):
    """The headline gate: P/R >= 0.95 (expected exactly 1.0)."""
    got = kg.kg_edges.toPandas()
    prec, rec = _pr(got, gold["triples"], TRIPLE_KEY)
    assert prec >= 0.95 and rec >= 0.95, (prec, rec)
    assert prec == 1.0 and rec == 1.0, (prec, rec)
    # confidence values carried through identically
    g = gold["triples"].sort_values(TRIPLE_KEY).reset_index(drop=True)
    s = got.sort_values(TRIPLE_KEY).reset_index(drop=True)
    assert len(g) == len(s)
    assert (g["confidence"].values == s["confidence"].values).all()


def test_node_parity(kg, tables, gold):
    want = oracle_nodes(gold["mentions"], tables["concept_aliases"])
    got = kg.kg_nodes.toPandas().sort_values("cui").reset_index(drop=True)
    assert list(got["cui"]) == list(want["cui"])
    assert got["mention_count"].tolist() == want["mention_count"].tolist()
    for a, b in zip(got["surfaces"], want["surfaces"]):
        assert list(a) == list(b)


def test_candidates_topk_deterministic(kg):
    """Candidate table: rank unique per (alias_key, surface), rank<=10,
    scores non-increasing with rank."""
    pdf = kg.candidates.toPandas()
    assert pdf["rank"].max() <= 10
    grp = pdf.sort_values(["alias_key", "surface", "rank"]).groupby(["alias_key", "surface"])
    for _, g in grp:
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert (g["score"].diff().dropna() <= 1e-12).all()


def test_linking_functional(kg):
    """Linking is functional: at most one accepted CUI per (alias_key, surface)."""
    dup = (
        kg.resolution.groupBy("alias_key", "surface")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dup == 0


def test_provenance_invariant(kg, tables):
    """No triple without a source (conv_id, turn_idx) present in the input."""
    src = tables["transcripts"][["conv_id", "turn_idx"]].drop_duplicates()
    edges = kg.kg_edges.select("conv_id", "turn_idx").distinct().toPandas()
    merged = edges.merge(src, on=["conv_id", "turn_idx"], how="left", indicator=True)
    assert (merged["_merge"] == "both").all()


def test_empty_inputs_produce_empty_outputs(spark):
    """Degenerate inputs must not error: empty transcripts and/or empty
    dictionary yield empty (but well-typed) outputs."""
    from knowledge_graph_integration_rag_biomedical_qna_spark.plans.pipeline import build_kg
    from knowledge_graph_integration_rag_biomedical_qna_spark.sources.io import (
        ALIASES_SCHEMA,
        TRANSCRIPTS_SCHEMA,
    )

    empty_t = spark.createDataFrame([], TRANSCRIPTS_SCHEMA)
    empty_a = spark.createDataFrame([], ALIASES_SCHEMA)
    some_t = spark.createDataFrame(
        [("c1", 1, "user", "aspirin inhibits cox2.", "", __import__("datetime").datetime(2026, 1, 1))],
        TRANSCRIPTS_SCHEMA,
    )
    kg1 = build_kg(spark, empty_t, empty_a, persist=False)
    assert kg1.kg_edges.count() == 0 and kg1.kg_nodes.count() == 0
    kg2 = build_kg(spark, some_t, empty_a, persist=False)
    assert kg2.kg_edges.count() == 0 and kg2.mentions.count() == 0


def test_question_retrieval(spark, fixture_dir):
    """Query side: a question mentioning a known alias retrieves only edges
    touching that alias's CUI, ranked deterministically."""
    from knowledge_graph_integration_rag_biomedical_qna_spark.plans.pipeline import (
        broadcast_alias_keys,
        build_kg,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.plans.query import (
        link_questions,
        retrieve_evidence,
    )

    transcripts = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    aliases = spark.read.parquet(f"{fixture_dir}/concept_aliases.parquet")
    kg = build_kg(spark, transcripts, aliases, persist=False)
    # pick a surface guaranteed to exist: the first alias in the table
    alias_row = aliases.orderBy("alias_key").first()
    q = spark.createDataFrame(
        [(1, f"tell me about {alias_row['alias']} please")], "question_id int, text string"
    )
    keys_bc = broadcast_alias_keys(spark, aliases)
    links = link_questions(spark, q, aliases, keys_bc).toPandas()
    assert len(links) >= 1
    linked_cuis = set(links["cui"])
    ev = retrieve_evidence(
        link_questions(spark, q, aliases, keys_bc), kg.kg_edge_stats, k=10
    ).toPandas()
    for _, row in ev.iterrows():
        assert row["subj_cui"] in linked_cuis or row["obj_cui"] in linked_cuis
    assert ev["rank"].is_monotonic_increasing or len(ev) <= 1


def test_duplicate_turn_dedup_matches_oracle(spark):
    """Duplicate (conv_id, turn_idx) rows (at-least-once ingest) dedupe
    first-wins under the stable (ts, role, text, tool) order — identical in
    the Spark window and the oracle's stable sort, including ts ties."""
    import datetime as dt

    import pandas as pd

    from knowledge_graph_integration_rag_biomedical_qna_spark.operators.turn_assembly import (
        assemble_turns,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.oracle.pipeline import (
        oracle_turns,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.sources.io import (
        TRANSCRIPTS_SCHEMA,
    )

    t0 = dt.datetime(2026, 1, 1)
    t1 = dt.datetime(2026, 1, 1, 0, 1)
    rows = [
        # same turn re-sent later with different text -> earlier ts wins
        ("c1", 0, "user", "first version.", "", t0),
        ("c1", 0, "user", "second version.", "", t1),
        # ts tie -> role breaks it (assistant < tool < user lexicographically)
        ("c1", 1, "tool", "tool text.", "search", t0),
        ("c1", 1, "assistant", "assistant text.", "", t0),
        # ts+role tie -> text breaks it
        ("c2", 0, "user", "bbb.", "", t0),
        ("c2", 0, "user", "aaa.", "", t0),
        # empty duplicate row and a whitespace-only turn
        ("c2", 1, "user", "", "", t0),
        ("c2", 2, "user", "   ", "", t0),
        ("c2", 3, "user", "kept.", "", t0),
    ]
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    got = (
        assemble_turns(df)
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    want = (
        oracle_turns(pdf)[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got["turn_idx"] = got["turn_idx"].astype("int64")
    want["turn_idx"] = want["turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    assert got["text"].tolist() == ["first version.", "assistant text.", "aaa.", "kept."]


def test_candidate_ranking_parity_with_oracle(kg, gold, tables):
    """Stage [4]-[5] in isolation: the Spark candidate table's ranked (cui,
    score, rank) per surface must equal the oracle's rank_candidates on the
    same mentions."""
    from knowledge_graph_integration_rag_biomedical_qna_spark.oracle.pipeline import (
        oracle_links,
    )

    want = oracle_links(gold["mentions"].head(300), tables["concept_aliases"])
    got = kg.candidates.toPandas()
    got_map = {
        (r["surface"], r["rank"]): (r["cui"], round(r["score"], 6))
        for _, r in got.iterrows()
    }
    for _, r in want.iterrows():
        key = (r["surface"], r["rank"])
        assert key in got_map, key
        assert got_map[key] == (r["cui"], round(r["score"], 6)), key


def test_adversarial_inputs_match_pandas_oracle(spark):
    """build_kg == oracle_turns+oracle_triples on hostile inputs: unicode,
    emoji, the \\x00 sentinel, null text, whitespace-only text, a duplicate
    (conv_id, turn_idx) whose first-wins winner is whitespace-only (the turn
    must then vanish: dedup happens BEFORE the empty-text filter, both
    engines), RE2-divergent \\x0b, and mixed casing/whitespace."""
    import datetime as dt

    import pandas as pd

    from knowledge_graph_integration_rag_biomedical_qna_spark.oracle.pipeline import (
        oracle_triples,
        oracle_turns,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.plans.pipeline import build_kg
    from knowledge_graph_integration_rag_biomedical_qna_spark.sources.synth import (
        synth_aliases,
    )

    ts = dt.datetime(2025, 1, 1)
    rows = [
        ("c1", 0, "user", "spark treats window. batch inhibits stream!", None, ts),
        ("c1", 1, "assistant", "café über spark treats stream.", None, ts),
        ("c1", 2, "user", "emoji \U0001f600 spark causes column. done.", None, ts),
        ("c2", 0, "user", "null byte \x00 spark treats batch.", None, ts),
        ("c2", 1, "user", None, None, ts),
        ("c2", 2, "user", "   \t\n  ", None, ts),
        ("c2", 2, "user", "dup turn: vector prevents stream.", None, ts),
        ("c3", 0, "user", "a.\x0bvector treats batch.", None, ts),
        ("c3", 1, "user", "tabs\tand  double  spaces. spark activates table .", None, ts),
        ("c3", 2, "user", "spark TREATS Window; STREAM causes BATCH.", None, ts),
    ]
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    aliases = synth_aliases(spark)
    kg = build_kg(spark, tr, aliases, persist=False)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["subj_cui"], r["pred"], r["obj_cui"],
         round(r["confidence"], 6))
        for r in kg.kg_edges.collect()
    )
    want = oracle_triples(oracle_turns(pd.DataFrame(rows, columns=cols)), aliases.toPandas())
    want_t = sorted(
        (r.conv_id, int(r.turn_idx), r.subj_cui, r.pred, r.obj_cui,
         round(float(r.confidence), 6))
        for r in want.itertuples()
    )
    assert got == want_t and len(got) > 0
    # the shadowed c2 turn 2 must contribute nothing in BOTH engines
    assert not any(c == "c2" and t == 2 for c, t, *_ in got)


def test_persist_mentions_single_extraction_pass(spark, fixture_dir, tmp_path):
    """persist_mentions=True: edges AND token spans come off ONE cached
    extraction pass; the default (collapsed cache) pays a second lazy pass
    for .mentions. Counted via worker-side index accesses (1 per task per
    pass — same partitioning both runs, so the default path is exactly 2x)."""
    from knowledge_graph_integration_rag_biomedical_qna_spark.fixtures.testing import (
        CountingAliasIndex,
    )

    transcripts = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    aliases = spark.read.parquet(f"{fixture_dir}/concept_aliases.parquet")
    keys = [r["alias_key"] for r in aliases.select("alias_key").distinct().collect()]

    def run(tag, **kwargs):
        path = tmp_path / f"accesses_{tag}.log"
        idx = CountingAliasIndex(keys, path)
        kg = build_kg(spark, transcripts, aliases, alias_index=idx, **kwargs)
        n_edges = kg.kg_edges.count()
        n_mentions = kg.mentions.count()
        kg.unpersist()
        return n_edges, n_mentions, sum(1 for _ in open(path))

    e1, m1, n_shared = run("persist", persist_mentions=True)
    e2, m2, n_default = run("default")
    assert (e1, m1) == (e2, m2) and m1 > 0
    # default: one collapsed pass (edges) + one lazy full pass (mentions);
    # persist_mentions: both views read the single cached full pass
    assert n_default == 2 * n_shared, (n_default, n_shared)


def test_mentions_view_raises_on_collapsed_input(spark, fixture_dir):
    """A collapsed extraction has no per-occurrence 'm' rows; mentions_view
    must fail loudly instead of returning a silent empty result (r5 advice)."""
    import pytest as _pytest

    from knowledge_graph_integration_rag_biomedical_qna_spark.operators.extraction import (
        extract_collapsed_df, mentions_view,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.operators.turn_assembly import (
        assemble_turns,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.plans.pipeline import (
        broadcast_alias_keys,
    )

    transcripts = spark.read.parquet(f"{fixture_dir}/transcripts.parquet")
    aliases = spark.read.parquet(f"{fixture_dir}/concept_aliases.parquet")
    bc = broadcast_alias_keys(spark, aliases)
    collapsed = extract_collapsed_df(assemble_turns(transcripts), bc)
    with _pytest.raises(ValueError, match="COLLAPSED"):
        mentions_view(collapsed)
