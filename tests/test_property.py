"""Property-based tests (hypothesis) for the shared core semantics.

These pin the invariants the distributed pipeline depends on: determinism,
non-overlap, offset validity, and oracle-vs-UDF agreement on arbitrary text.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from knowledge_graph_integration_rag_biomedical_qna_spark.core.linking import (
    rank_candidates,
)
from knowledge_graph_integration_rag_biomedical_qna_spark.core.patterns import (
    detect_mentions,
    detect_predicates,
    extract_mentions_and_triples,
    extract_triples,
)
from knowledge_graph_integration_rag_biomedical_qna_spark.core.text import (
    normalize_alias,
    split_sentences,
    tokenize,
)

KEYS = frozenset({"aspirin", "cox2", "beta blocker", "tnf alpha", "il-6"})

text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=200,
)
word_st = st.sampled_from(
    ["aspirin", "cox2", "beta", "blocker", "inhibits", "treats", "the",
     "patient", "is", "a", "treatment", "for", "il-6", "binds", "to", ".", ","]
)
sentence_st = st.lists(word_st, min_size=0, max_size=25).map(" ".join)


@given(text_st)
@settings(max_examples=300, deadline=None)
def test_split_sentences_total_and_nonempty(t):
    sents = split_sentences(t)
    assert all(len(s) > 1 for s in sents)
    assert all(s == s.strip() for s in sents)


@given(text_st)
@settings(max_examples=300, deadline=None)
def test_tokenize_offsets_consistent(t):
    for tok, a, b in tokenize(t):
        assert t[a:b] == tok
        assert tok


@given(sentence_st)
@settings(max_examples=300, deadline=None)
def test_mentions_nonoverlapping_and_deterministic(s):
    m1 = detect_mentions(s, KEYS)
    m2 = detect_mentions(s, KEYS)
    assert m1 == m2
    for a, b in zip(m1, m1[1:]):
        assert a.tok_end <= b.tok_start  # non-overlapping, ordered
    for m in m1:
        assert m.alias_key in KEYS
        assert normalize_alias(s[m.char_start:m.char_end]) == m.alias_key


@given(sentence_st)
@settings(max_examples=300, deadline=None)
def test_predicates_nonoverlapping(s):
    preds = detect_predicates(s)
    for (_, _, e1), (_, s2, _) in zip(preds, preds[1:]):
        assert e1 <= s2


@given(sentence_st)
@settings(max_examples=300, deadline=None)
def test_unified_equals_separate_paths(s):
    """extract_mentions_and_triples (pipeline path) must equal
    detect_mentions + extract_triples (oracle path) on any input."""
    m_u, t_u = extract_mentions_and_triples(s, KEYS)
    assert m_u == detect_mentions(s, KEYS)
    assert t_u == extract_triples(s, KEYS)


@given(sentence_st)
@settings(max_examples=300, deadline=None)
def test_triples_reference_detected_mentions(s):
    mentions = {m.alias_key for m in detect_mentions(s, KEYS)}
    for t in extract_triples(s, KEYS):
        assert t.subj_key in mentions and t.obj_key in mentions
        assert 0.1 <= t.confidence <= 1.0


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["C1", "C2", "C3", "C4"]),
            st.sampled_from(["aspirin", "asa", "acetylsalicylic acid"]),
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_ranking_deterministic_and_sorted(cands):
    r1 = rank_candidates("aspirin", cands)
    r2 = rank_candidates("aspirin", list(reversed(cands)))
    # candidate-list order must NOT affect the (cui, score) ranking: ties on
    # (score, prior) break on cui, and equal-cui ties yield identical tuples
    assert r1 == r2
    scores = [s for _, s in r1]
    assert scores == sorted(scores, reverse=True)
    assert len(r1) <= 10


def _naive_longest_match(sentence, keys):
    """Reference matcher: the original greedy 3-2-1 n-gram join algorithm,
    kept here as the specification the AliasIndex fast path must equal."""
    from knowledge_graph_integration_rag_biomedical_qna_spark.core.patterns import (
        _norm_token,
    )

    toks = tokenize(sentence)
    norm = [_norm_token(w) for w, _, _ in toks]
    out, i, n = [], 0, len(toks)
    while i < n:
        hit = None
        for span in range(min(3, n - i), 0, -1):
            key = " ".join(norm[i : i + span])
            if key in keys:
                hit = (span, key)
                break
        if hit is None:
            i += 1
            continue
        span, key = hit
        out.append((i, i + span, key, sentence[toks[i][1] : toks[i + span - 1][2]]))
        i += span
    return out


@given(sentence_st, st.sets(st.sampled_from(
    ["aspirin", "cox2", "beta blocker", "il-6", "beta", "treatment", "the patient x"]
), max_size=7))
@settings(max_examples=300, deadline=None)
def test_alias_index_equals_naive_matcher(s, keys):
    """The first-token-indexed matcher must produce exactly the mentions of
    the naive greedy longest-match specification for any dictionary/sentence."""
    got = [
        (m.tok_start, m.tok_end, m.alias_key, m.surface)
        for m in detect_mentions(s, frozenset(keys))
    ]
    assert got == _naive_longest_match(s, frozenset(keys))


# --- vectorized kernel == per-row kernel (the r2 fast-path equivalence) ---

unicode_text_st = st.text(min_size=0, max_size=120)  # full unicode incl. \x00
# chars where Python-\s and RE2-\s disagree (vertical tab + FS/GS/RS/US) —
# these must be routed to the slow path or sentence splits diverge (ADVICE r2)
divergent_ws_text_st = st.lists(
    st.sampled_from(
        list("\x0b\x1c\x1d\x1e\x1f\x0c.!? ") + sorted(KEYS)[:3] + ["treats", "a"]
    ),
    min_size=0,
    max_size=25,
).map("".join)


def _norm_unified(df):
    import pandas as pd

    df = df.reset_index(drop=True).copy()
    df["conv_id"] = df["conv_id"].astype(str)
    df["turn_idx"] = df["turn_idx"].astype("int64")
    df["kind"] = df["kind"].astype(object)
    # the fast path returns ArrowDtype string columns (pd.NA nulls); compare
    # both paths in the object/None representation
    from knowledge_graph_integration_rag_biomedical_qna_spark.core.vectorized import (
        _strings_to_object,
    )

    return _strings_to_object(df)


@given(
    st.lists(
        st.one_of(sentence_st, text_st, unicode_text_st, divergent_ws_text_st),
        min_size=0,
        max_size=8,
    )
)
@settings(max_examples=200, deadline=None)
def test_vectorized_kernel_equals_row_path(texts):
    """extract_unified_pdf (pyarrow fast path + non-ASCII fallback) produces
    the exact row set, row ORDER, and values of the per-row Python matcher."""
    import pandas as pd

    from knowledge_graph_integration_rag_biomedical_qna_spark.core.patterns import AliasIndex
    from knowledge_graph_integration_rag_biomedical_qna_spark.core.vectorized import (
        extract_unified_pdf,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.operators.extraction import (
        row_path_unified_pdf,
    )

    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(len(texts))],
            "turn_idx": list(range(len(texts))),
            "text": texts,
        }
    )
    idx = AliasIndex(KEYS)
    got = _norm_unified(extract_unified_pdf(pdf, idx))
    want = _norm_unified(row_path_unified_pdf(pdf, idx))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


ascii_sentence_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0,
    max_size=150,
).map(lambda s: " ".join(s.split()))  # ws-normalized, like post-split sentences


@given(st.lists(ascii_sentence_st.filter(lambda s: len(s) > 1), min_size=1, max_size=6))
@settings(max_examples=300, deadline=None)
def test_byte_tokenizer_equals_regex_tokenize(sents):
    """_tokenize_arrow (numpy byte-LUT scan) must reproduce core.text.tokenize
    exactly on every sentence: token strings (lowered), sentence assignment,
    in-sentence positions, AND absolute char offsets."""
    import numpy as np
    import pyarrow as pa

    from knowledge_graph_integration_rag_biomedical_qna_spark.core.vectorized import (
        _tokenize_arrow,
    )

    arr = pa.array(sents, type=pa.string())
    tk = _tokenize_arrow(arr, pa)
    want = []  # (sent_idx, pos, lowered_token, start, end) per tokenize()
    base = 0
    for si, s in enumerate(sents):
        for pos, (tok, a, b) in enumerate(tokenize(s)):
            want.append((si, pos, tok.lower(), base + a, base + b))
        base += len(s)
    if tk == "EMPTY" or tk is None:
        assert not want, (sents, want)
        return
    low, sent_of, pos_in_sent, abs_start, abs_end, d = tk
    got = list(
        zip(sent_of.tolist(), pos_in_sent.tolist(), low.to_pylist(),
            abs_start.tolist(), abs_end.tolist())
    )
    assert got == want, (sents, got[:5], want[:5])


def test_divergent_whitespace_chars_route_to_slow_path():
    """Pinned regression (ADVICE r2): \\x0b and \\x1c-\\x1f are whitespace to
    Python's re but not RE2's ASCII \\s; rows containing them must produce
    identical sent_idx/rows via the slow path. \\x0c matches in both engines
    and may stay on the fast path."""
    import pandas as pd

    from knowledge_graph_integration_rag_biomedical_qna_spark.core.patterns import AliasIndex
    from knowledge_graph_integration_rag_biomedical_qna_spark.core.vectorized import (
        extract_unified_pdf,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.operators.extraction import (
        row_path_unified_pdf,
    )

    k = sorted(KEYS)
    texts = [f"{k[0]}.{ch}{k[1]} treats {k[2]}." for ch in "\x0b\x1c\x1d\x1e\x1f\x0c"]
    texts.append(f"{k[0]} treats {k[1]}.")  # plain fast-path row in the same batch
    pdf = pd.DataFrame(
        {"conv_id": [f"c{i}" for i in range(len(texts))],
         "turn_idx": list(range(len(texts))), "text": texts}
    )
    idx = AliasIndex(KEYS)
    got = _norm_unified(extract_unified_pdf(pdf, idx))
    want = _norm_unified(row_path_unified_pdf(pdf, idx))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


word_st = st.sampled_from(
    ["aspirin", "cox2", "beta", "blocker", "tnf", "alpha", "il-6", "treats",
     "inhibits", "the", "a", "risk", "of", "xyz"]
)


@given(
    st.lists(word_st, min_size=0, max_size=60),
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=60),
)
@settings(max_examples=150, deadline=None)
def test_ngram_masks_equal_per_span_is_in(words, breaks):
    """The single-pass union-vocabulary bitmask prefilter in _ngram_masks must
    produce exactly the per-span masks of the naive one-is_in-per-span
    specification (k=1 exact membership; k>=2 sentence-bounded k-gram
    membership) for any token stream and sentence layout."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from knowledge_graph_integration_rag_biomedical_qna_spark.core.patterns import AliasIndex
    from knowledge_graph_integration_rag_biomedical_qna_spark.core.vectorized import (
        _ngram_masks,
        _pa_vocab,
    )

    idx = AliasIndex(KEYS)
    values = pa.array(words, type=pa.string())
    # breaks -> monotone sentence ids of the same length as words
    sent_of = np.cumsum([(breaks[i % len(breaks)] == 0) if breaks else 0
                         for i in range(len(words))]).astype(np.int64) \
        if words else np.array([], dtype=np.int64)
    got = _ngram_masks(values, sent_of, _pa_vocab(idx), pc)
    kbl = idx.keys_by_len()
    total = len(words)
    for k, mask, keys, kpos in got:
        vocab = kbl.get(k, frozenset())
        want = np.zeros(total, dtype=bool)
        for p in range(total - k + 1):
            if k > 1 and sent_of[p] != sent_of[p + k - 1]:
                continue
            if " ".join(words[p : p + k]) in vocab:
                want[p] = True
        assert np.array_equal(np.asarray(mask, dtype=bool), want), (k, words)
        # the keys/kpos gather contract: keys[j] is the k-gram at kpos[j]
        if k > 1 and kpos is not None and len(kpos):
            for j, p in enumerate(kpos.tolist()):
                assert keys[j].as_py() == " ".join(words[p : p + k])
