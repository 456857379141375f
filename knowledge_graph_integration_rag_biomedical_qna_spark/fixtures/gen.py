"""Generate the synthetic transcripts / concepts / concept_aliases fixtures.

Schemas follow /root/repo/FIXTURES.md exactly. All randomness comes from
numpy.random.default_rng(seed); rows are written sorted by (conv_id, turn_idx)
so parquet output is byte-stable. Skew knobs:
- conversation length: Zipf-ish (most 3-10 turns, a few 50-200)
- hot aliases: a small alias set planted in >30% of turns (hot-entity skew)

Reference analogs: the planted `<alias> <pred> <alias>` sentences play the role
of the reference's gold QA pairs (rag2-generation/metrics.py:38-48); empty and
whitespace-only texts exercise the empty-abstract filter
(rag2-retriever/empty_abstract_filter.py:94-101); duplicate-ts turn pairs
exercise deterministic ordering tie-breaks.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..core.patterns import PREDICATE_LEXICON
from ..core.text import normalize_alias

SEED = 42

_SYLLABLES = [
    "zor", "fin", "mab", "tra", "lix", "ve", "nu", "pra", "sta", "dol",
    "cor", "mi", "ta", "rel", "xa", "ben", "flu", "gli", "ser", "ono",
]
_SEMTYPES = ["drug", "disease", "gene", "procedure", "symptom"]
_DISTRACTOR_WORDS = [
    "patient", "study", "result", "clinic", "report", "dose", "trial",
    "baseline", "cohort", "followup", "visit", "panel", "assay", "marker",
    "history", "outcome", "review", "chart", "note", "summary",
]
_TOOLS = ["search", "calculator", "pubmed", "notes", ""]
_ROLES = ["user", "assistant", "tool"]


def _make_name(rng: np.random.Generator, n_syl: int) -> str:
    return "".join(rng.choice(_SYLLABLES) for _ in range(n_syl))


def gen_concepts(rng: np.random.Generator, n: int = 300) -> pd.DataFrame:
    names: list[str] = []
    seen: set[str] = set()
    while len(names) < n:
        name = _make_name(rng, int(rng.integers(2, 4)))
        if name not in seen and name not in PREDICATE_LEXICON:
            seen.add(name)
            names.append(name)
    rows = []
    for i, name in enumerate(names):
        st = _SEMTYPES[int(rng.integers(0, len(_SEMTYPES)))]
        rows.append(
            {
                "cui": f"C{i + 1:07d}",
                "preferred_name": name,
                "semantic_type": st,
                "definition": f"{name} is a {st} entity studied in trials.",
            }
        )
    return pd.DataFrame(rows)


def gen_aliases(rng: np.random.Generator, concepts: pd.DataFrame) -> pd.DataFrame:
    """~800 alias rows; ambiguous aliases map to 2-4 CUIs with distinct priors."""
    rows = []
    for _, c in concepts.iterrows():
        name = c["preferred_name"]
        rows.append({"alias": name, "cui": c["cui"], "prior": 0.9})
        # case variant (same alias_key after normalization, distinct surface)
        if rng.random() < 0.5:
            rows.append({"alias": name.capitalize(), "cui": c["cui"], "prior": 0.9})
        # abbreviation-style short alias
        if rng.random() < 0.4 and len(name) > 5:
            rows.append({"alias": name[:4].upper(), "cui": c["cui"], "prior": 0.7})
        # two-token alias
        if rng.random() < 0.3:
            suffix = ["complex", "receptor", "syndrome", "agent"][int(rng.integers(0, 4))]
            rows.append({"alias": f"{name} {suffix}", "cui": c["cui"], "prior": 0.8})
    df = pd.DataFrame(rows)

    # ambiguous aliases: one surface shared by 2-4 CUIs with distinct priors
    cuis = concepts["cui"].tolist()
    amb_rows = []
    for i in range(40):
        surf = _make_name(rng, 2) + "amb"
        k = int(rng.integers(2, 5))
        chosen = rng.choice(len(cuis), size=k, replace=False)
        priors = sorted(
            {round(float(p), 3) for p in rng.uniform(0.2, 0.95, size=k)}, reverse=True
        )
        while len(priors) < k:  # enforce distinct priors
            priors.append(round(priors[-1] - 0.013, 3))
        for j, ci in enumerate(chosen):
            amb_rows.append({"alias": surf, "cui": cuis[int(ci)], "prior": priors[j]})
    df = pd.concat([df, pd.DataFrame(amb_rows)], ignore_index=True)
    df["alias_key"] = df["alias"].map(normalize_alias)
    # one (alias_key, cui) pair at most once: keep max prior
    df = (
        df.sort_values(["alias_key", "cui", "prior"], ascending=[True, True, False])
        .drop_duplicates(["alias_key", "cui"])
        .reset_index(drop=True)
    )
    return df[["alias_key", "alias", "cui", "prior"]]


def _triple_sentence(rng: np.random.Generator, aliases: list[str], hot: list[str]) -> str:
    pred = list(PREDICATE_LEXICON.keys())[int(rng.integers(0, len(PREDICATE_LEXICON)))]
    subj = hot[int(rng.integers(0, len(hot)))] if rng.random() < 0.35 else aliases[
        int(rng.integers(0, len(aliases)))
    ]
    obj = aliases[int(rng.integers(0, len(aliases)))]
    # mixed-case / punctuation variants of aliases
    if rng.random() < 0.2:
        subj = subj.upper() if rng.random() < 0.5 else subj.capitalize()
    tail = "." if rng.random() < 0.8 else "!"
    lead = ""
    if rng.random() < 0.3:
        lead = f"the {_DISTRACTOR_WORDS[int(rng.integers(0, len(_DISTRACTOR_WORDS)))]} shows "
    return f"{lead}{subj} {pred} {obj}{tail}"


def _distractor_sentence(rng: np.random.Generator) -> str:
    k = int(rng.integers(4, 10))
    words = [ _DISTRACTOR_WORDS[int(rng.integers(0, len(_DISTRACTOR_WORDS)))] for _ in range(k)]
    return " ".join(words) + "."


def gen_transcripts(
    rng: np.random.Generator,
    aliases: pd.DataFrame,
    n_conv: int = 200,
) -> pd.DataFrame:
    alias_surfaces = aliases["alias"].unique().tolist()
    hot = alias_surfaces[:5]  # hot-entity skew: planted disproportionately
    rows = []
    base_ts = np.datetime64("2026-01-01T00:00:00", "us")
    for ci in range(n_conv):
        conv_id = f"conv_{ci:06d}"
        # Zipf-ish turn counts: ~5% long conversations
        if rng.random() < 0.05:
            n_turns = int(rng.integers(50, 201))
        else:
            n_turns = int(rng.integers(3, 11))
        ts = base_ts + int(rng.integers(0, 10_000_000)) * np.timedelta64(1_000_000, "us")
        for ti in range(n_turns):
            role = _ROLES[ti % 3]
            r = rng.random()
            if r < 0.45:
                n_sent = int(rng.integers(1, 4))
                text = " ".join(
                    _triple_sentence(rng, alias_surfaces, hot)
                    if rng.random() < 0.7
                    else _distractor_sentence(rng)
                    for _ in range(n_sent)
                )
            elif r < 0.85:
                text = _distractor_sentence(rng)
            elif r < 0.92:
                text = ""
            elif r < 0.95:
                text = "   "
            else:
                text = _triple_sentence(rng, alias_surfaces, hot)
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else ""
            # duplicate-ts pairs to exercise deterministic tie-breaks
            if ti > 0 and rng.random() < 0.1:
                pass  # keep same ts as previous turn
            else:
                ts = ts + int(rng.integers(1, 120)) * np.timedelta64(1_000_000, "us")
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": np.int32(ti),
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts,
                }
            )
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    # microsecond precision: Spark parquet readers reject TIMESTAMP(NANOS)
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def generate_all(out_dir: str, n_conv: int = 200, seed: int = SEED) -> dict[str, pd.DataFrame]:
    """Generate and write transcripts/concepts/concept_aliases parquet files."""
    rng = np.random.default_rng(seed)
    concepts = gen_concepts(rng)
    aliases = gen_aliases(rng, concepts)
    transcripts = gen_transcripts(rng, aliases, n_conv=n_conv)
    os.makedirs(out_dir, exist_ok=True)
    concepts.to_parquet(os.path.join(out_dir, "concepts.parquet"), index=False)
    aliases.to_parquet(os.path.join(out_dir, "concept_aliases.parquet"), index=False)
    transcripts.to_parquet(os.path.join(out_dir, "transcripts.parquet"), index=False)
    return {"concepts": concepts, "concept_aliases": aliases, "transcripts": transcripts}


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "data/fixtures"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    tables = generate_all(out, n_conv=n)
    for name, df in tables.items():
        print(name, len(df))
