"""Unit tests for the shared pure-Python semantics (core/)."""

from knowledge_graph_integration_rag_biomedical_qna_spark.core.linking import (
    link_score,
    rank_candidates,
    resolve,
)
from knowledge_graph_integration_rag_biomedical_qna_spark.core.patterns import (
    detect_mentions,
    detect_predicates,
    extract_triples,
)
from knowledge_graph_integration_rag_biomedical_qna_spark.core.text import (
    ngram_jaccard,
    normalize_alias,
    split_sentences,
    tokenize,
)


def test_split_sentences():
    assert split_sentences("a b. c d! e f? g h") == ["a b.", "c d!", "e f?", "g h"]
    assert split_sentences("") == []
    assert split_sentences("   ") == []
    assert split_sentences(None) == []
    assert split_sentences("one sentence no terminator") == ["one sentence no terminator"]
    # len<=1 units dropped (reference skipped len-1 sentences)
    assert split_sentences("! real sentence here.") == ["real sentence here."]
    assert split_sentences("x. real sentence here.") == ["x.", "real sentence here."]


def test_normalize_alias():
    assert normalize_alias("  Aspirin ") == "aspirin"
    assert normalize_alias("Beta   Blocker") == "beta blocker"
    assert normalize_alias("(aspirin),") == "aspirin"


def test_tokenize_offsets():
    toks = tokenize("abc de-f!")
    assert [t[0] for t in toks] == ["abc", "de-f"]
    assert toks[0][1:] == (0, 3)


def test_detect_mentions_longest_match():
    keys = frozenset({"aspirin", "beta blocker", "blocker"})
    ms = detect_mentions("Aspirin and beta blocker use.", keys)
    assert [(m.alias_key, m.tok_start, m.tok_end) for m in ms] == [
        ("aspirin", 0, 1),
        ("beta blocker", 2, 4),  # longest match wins over "blocker"
    ]
    assert ms[0].surface == "Aspirin"  # original casing preserved


def test_detect_predicates_multiword():
    assert detect_predicates("X is a treatment for Y") == [("treats", 1, 5)]
    assert detect_predicates("a inhibits b and reduces c") == [
        ("inhibits", 1, 2),
        ("decreases", 4, 5),
    ]


def test_extract_triples_basic():
    keys = frozenset({"aspirin", "cox2"})
    ts = extract_triples("aspirin inhibits cox2.", keys)
    assert len(ts) == 1
    t = ts[0]
    assert (t.subj_key, t.pred, t.obj_key, t.confidence) == ("aspirin", "inhibits", "cox2", 1.0)


def test_extract_triples_gap_confidence():
    keys = frozenset({"aspirin", "cox2"})
    ts = extract_triples("aspirin strongly inhibits the enzyme cox2.", keys)
    assert len(ts) == 1
    # gaps: subj 1 token ("strongly"), obj 2 tokens ("the enzyme")
    assert ts[0].confidence == 0.7


def test_extract_triples_requires_both_args():
    keys = frozenset({"aspirin"})
    assert extract_triples("aspirin inhibits pain.", keys) == []
    assert extract_triples("aspirin inhibits aspirin.", keys)  # two mention hits ok


def test_link_score_and_ranking():
    # exact alias match -> sim 1.0 -> score 0.7 + 0.3*prior
    assert link_score("aspirin", "aspirin", 0.9) == 0.97
    cands = [("C2", "amb", 0.5), ("C1", "amb", 0.8), ("C3", "amb", 0.8)]
    ranked = rank_candidates("amb", cands)
    # prior desc then cui asc tie-break
    assert [c for c, _ in ranked] == ["C1", "C3", "C2"]
    assert resolve("amb", cands)[0] == "C1"


def test_resolve_floor():
    # dissimilar alias + tiny prior -> below 0.5 floor -> rejected
    assert resolve("zzzz", [("C1", "totally different", 0.01)]) is None


def test_ngram_jaccard_bounds():
    assert ngram_jaccard("abc", "abc") == 1.0
    assert 0.0 <= ngram_jaccard("abcdef", "abcxyz") < 1.0
