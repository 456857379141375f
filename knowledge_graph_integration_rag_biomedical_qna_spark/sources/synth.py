"""Deterministic transcript synthesis from the driver-provided documents table.

The driver testdata has no transcripts table, so benchmarks and the flagship
entry query derive one from `documents.parquet` with pure column arithmetic
(no randomness — BASELINE.json forbids external data and Date/random are
unavailable in the oracle path):

- each document becomes one conversation (`conv_<doc_id>`);
- its text is chunked into turns of TURN_TOKENS tokens;
- every third (doc_id + turn_idx) gets a planted `<alias> <pred> <alias>.`
  sentence appended, with alias/pred picked by modular arithmetic — so the KG
  pipeline has deterministic extractable content and a row-count oracle.

The companion alias table maps a subset of the document vocabulary to
synthetic CUIs (including one ambiguous alias to exercise top-k/tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.text import normalize_alias

TURN_TOKENS = 12

# vocabulary words present in the synthetic documents corpus
ALIAS_SPEC: list[tuple[str, str, float]] = [
    ("spark", "K0000001", 0.9),
    ("customer", "K0000002", 0.9),
    ("table", "K0000003", 0.9),
    ("window", "K0000004", 0.9),
    ("vector", "K0000005", 0.9),
    ("column", "K0000006", 0.9),
    ("batch", "K0000007", 0.9),
    ("stream", "K0000008", 0.9),
    # ambiguous alias: two CUIs, distinct priors
    ("data", "K0000009", 0.8),
    ("data", "K0000010", 0.3),
]

PLANT_PREDS = ["inhibits", "treats", "causes", "activates", "prevents"]
PLANT_SUBJECTS = [a for a, _, _ in ALIAS_SPEC[:8]]


def synth_aliases(spark: SparkSession) -> DataFrame:
    rows = [(normalize_alias(a), a, cui, p) for a, cui, p in ALIAS_SPEC]
    return spark.createDataFrame(rows, "alias_key string, alias string, cui string, prior double")


def synth_transcripts(docs: DataFrame) -> DataFrame:
    """documents -> transcripts(conv_id, turn_idx, role, text, tool, ts)."""
    toks = F.split(F.trim(F.col("text")), r"[ \t\n\x0b\f\r]+")
    n_turns = F.greatest(F.ceil(F.size(toks) / F.lit(TURN_TOKENS)).cast("int"), F.lit(1))
    turns = docs.select(
        F.col("doc_id"),
        toks.alias("toks"),
        F.posexplode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx", "_"),
    ).select(
        "doc_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.array_join(
            F.slice(F.col("toks"), F.col("turn_idx") * TURN_TOKENS + 1, TURN_TOKENS), " "
        ).alias("chunk"),
    )

    subjects = F.array(*[F.lit(s) for s in PLANT_SUBJECTS])
    preds = F.array(*[F.lit(p) for p in PLANT_PREDS])
    plant = F.concat_ws(
        " ",
        F.element_at(subjects, (F.pmod(F.col("doc_id") * 7 + F.col("turn_idx"), F.lit(len(PLANT_SUBJECTS))) + 1).cast("int")),
        F.element_at(preds, (F.pmod(F.col("doc_id") + F.col("turn_idx"), F.lit(len(PLANT_PREDS))) + 1).cast("int")),
        F.element_at(subjects, (F.pmod(F.col("doc_id") * 13 + F.col("turn_idx"), F.lit(len(PLANT_SUBJECTS))) + 1).cast("int")),
    )
    text = F.when(
        F.pmod(F.col("doc_id") + F.col("turn_idx"), F.lit(3)) == 0,
        F.concat(F.col("chunk"), F.lit(". "), plant, F.lit(".")),
    ).otherwise(F.concat(F.col("chunk"), F.lit(".")))

    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"))
    return turns.select(
        F.concat(F.lit("conv_"), F.col("doc_id")).alias("conv_id"),
        F.col("turn_idx"),
        F.element_at(roles, (F.pmod(F.col("turn_idx"), F.lit(3)) + 1).cast("int")).alias("role"),
        text.alias("text"),
        F.when(F.pmod(F.col("turn_idx"), F.lit(3)) == 2, F.lit("search")).otherwise(F.lit("")).alias("tool"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("doc_id") % 100000) * 60 + F.col("turn_idx"))
        ).alias("ts"),
    )
