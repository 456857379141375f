"""Salted-join correctness: identical output to the plain join on a skewed
key distribution, with the hot key spread across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from knowledge_graph_integration_rag_biomedical_qna_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 10k rows, 90% on one hot key
    big = spark.range(10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))
        ).alias("k"),
    )
    small = spark.createDataFrame(
        [("HOT", 1.0)] + [(f"k{i}", float(i)) for i in range(50)], "k string, v double"
    )
    plain = big.join(small, "k").select("row_id", "k", "v")
    salted = salted_join(big, small, ["k"], row_key="row_id")
    a = plain.orderBy("row_id").collect()
    b = salted.select("row_id", "k", "v").orderBy("row_id").collect()
    assert a == b
    # the hot key really is spread over many salt buckets
    spread = (
        big.filter(F.col("k") == "HOT")
        .withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.lit(16)).cast("int"))
        .select("_salt").distinct().count()
    )
    assert spread >= 12


def test_salted_left_join(spark):
    big = spark.range(100).select(F.col("id").alias("row_id"), F.lit("HOT").alias("k"))
    small = spark.createDataFrame([("COLD", 1.0)], "k string, v double")
    out = salted_join(big, small, ["k"], row_key="row_id", how="left")
    assert out.count() == 100
    assert out.filter(F.col("v").isNotNull()).count() == 0


def test_salted_join_rejects_non_replication_invariant_how(spark):
    """right/full/semi/anti are not invariant under small-side replication —
    the helper must refuse them loudly (r4 review: a 'right' join surfaced
    every unmatched small row salt_buckets times)."""
    import pytest

    big = spark.createDataFrame([(1, "k")], "row_id int, k string")
    small = spark.createDataFrame([("k", 1)], "k string, v int")
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(big, small, ["k"], row_key="row_id", how=how)
