"""SparkSession factory with scale-aware defaults.

Local-mode knobs mirror what a 1000-executor cluster deployment would set via
spark-submit: AQE on (runtime re-plan + skew-join splitting), shuffle
partitions sized to cores, Arrow enabled for every pandas-UDF boundary, UTC
session timezone (so DuckDB-oracle comparisons are stable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .core.config import ARROW_BATCH


def get_spark(
    app_name: str = "kg_construct",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH * 32))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # This engine's df.persist() uses are short-lived STAGE BOUNDARIES
        # (the unified extraction + two vocabulary-sized tables in build_kg),
        # re-read once or twice then dropped — columnar-cache compression CPU
        # dominates there (interleaved best-of-3 at sf0.1 x20: 3.76 s
        # uncompressed vs 4.47 s compressed, -16%; r3 measured -29% at 8M
        # turns). Default MEMORY_AND_DISK still spills oversized caches; jobs
        # too large to cache at all use plans.checkpoint.ResumableKGRun,
        # which materializes boundaries to (compressed) parquet instead.
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
