"""Tolerant JSONL transcript ingestion (S2).

Reference analog: conv_jsonl_to_json.py:4-29 — line-wise parse with bad-line
skip via try/except. Spark-native replacement: `spark.read.json` in PERMISSIVE
mode with a `_corrupt_record` column; malformed lines become quarantine rows
(counted, optionally persisted) instead of silently vanishing, and the driver
never loops over lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


def read_json_array(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S1: whole-file JSON array scan (the reference's json.load of a list),
    via multiLine mode — each file is one JSON document containing an array."""
    r = spark.read.option("multiLine", "true")
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_transcripts_jsonl(
    spark: SparkSession, path: str, quarantine_path: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """Returns (good_rows, bad_rows). Good rows satisfy the transcripts
    contract (non-null keys); bad rows carry the raw line for quarantine."""
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    bad = raw.filter(
        F.col("_corrupt_record").isNotNull()
        | F.col("conv_id").isNull()
        | F.col("turn_idx").isNull()
    ).select(F.coalesce(F.col("_corrupt_record"), F.to_json(F.struct("*"))).alias("raw"))
    good = (
        raw.filter(
            F.col("_corrupt_record").isNull()
            & F.col("conv_id").isNotNull()
            & F.col("turn_idx").isNotNull()
        )
        .drop("_corrupt_record")
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.coalesce("role", F.lit("user")).alias("role"),
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("tool", F.lit("")).alias("tool"),
            "ts",
        )
    )
    if quarantine_path:
        bad.write.mode("overwrite").parquet(quarantine_path)
    return good, bad
