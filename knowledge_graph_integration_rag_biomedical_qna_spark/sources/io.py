"""Table IO: Iceberg-first with a transparent parquet fallback.

The production deployment target is an Iceberg catalog
(`spark.read.table("cat.db.transcripts")`, `df.writeTo(...).createOrReplace()`
— reference's JSON-file stage boundaries become atomic table commits, SURVEY.md
§1.4). The sandbox image has no Iceberg runtime jar, so `TableIO` probes for it
once and otherwise uses parquet directories with the same atomic-replace
semantics (write to tmp, rename). All pipeline code goes through this
interface only.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ALIASES_SCHEMA = T.StructType(
    [
        T.StructField("alias_key", T.StringType(), False),
        T.StructField("alias", T.StringType(), False),
        T.StructField("cui", T.StringType(), False),
        T.StructField("prior", T.DoubleType(), False),
    ]
)


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableIO:
    """read/write named tables; Iceberg when available, else parquet dirs."""

    def __init__(self, spark: SparkSession, warehouse: str, catalog: str = "local"):
        self.spark = spark
        self.warehouse = warehouse
        self.catalog = catalog
        self.iceberg = _iceberg_available(spark) and bool(
            spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        )

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def read(self, name: str, schema: T.StructType | None = None) -> DataFrame:
        if self.iceberg:
            return self.spark.read.table(f"{self.catalog}.db.{name}")
        r = self.spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.iceberg:
            return self.spark.catalog.tableExists(f"{self.catalog}.db.{name}")
        p = self._path(name)
        return os.path.isdir(p) and bool(os.listdir(p))

    def replace(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        """Atomic create-or-replace (Iceberg createOrReplace / tmp+rename)."""
        if self.iceberg:
            w = df.writeTo(f"{self.catalog}.db.{name}")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        final = self._path(name)
        tmp = final + ".tmp-" + uuid.uuid4().hex[:8]
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(tmp)
        # crash-safe swap: park the old table under a .old name FIRST so the
        # final path is never unbound (rmtree-then-rename had a window where
        # a crash lost the live table and left only the .tmp dir — r4 review)
        old = final + ".old-" + uuid.uuid4().hex[:8]
        if os.path.isdir(final):
            os.replace(final, old)
        try:
            os.replace(tmp, final)
        except Exception:
            if os.path.isdir(old):  # roll the old table back into place
                os.replace(old, final)
            raise
        shutil.rmtree(old, ignore_errors=True)

    def append(self, df: DataFrame, name: str, partition_by: list[str] | None = None) -> None:
        if self.iceberg:
            df.writeTo(f"{self.catalog}.db.{name}").append()
            return
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read the transcripts input table with its contract schema
    (conv_id, turn_idx, role, text, tool, ts) — BASELINE.json input_hint."""
    if path.endswith(".parquet") or os.path.isdir(path):
        return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)
    return spark.read.table(path)


def read_aliases(spark: SparkSession, path: str) -> DataFrame:
    if path.endswith(".parquet") or os.path.isdir(path):
        return spark.read.schema(ALIASES_SCHEMA).parquet(path)
    return spark.read.table(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 32,
    sort_col: str | None = "turn_idx",
) -> None:
    """Persist a table bucketed (and optionally sorted) by a join/window key.

    Repeat consumers that join or window on `bucket_col` then read it with
    `spark.table(...)` and Catalyst reuses the bucketing: NO exchange on that
    side of the join. This is the storage-layout answer to "the transcripts
    table is joined by conv_id by every downstream job" — at 100 TB, one
    bucketed write amortizes the shuffle across every job that follows.

    The writer REPARTITIONS by the bucket column first: without it, every
    writer task emits one file per bucket (tasks x buckets small files — the
    r3 bench's 1,024-file table), and each bucket's scan task then pays a
    serial many-tiny-file read that erased the zero-exchange win (measured
    54% slower than the shuffle-ful plan). `repartition(n, col)` uses the
    same murmur3 hash family as bucketBy, so each writer task holds exactly
    one bucket -> one well-sized file per bucket, and the one-time write cost
    is the same shuffle the un-bucketed plan pays EVERY run.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a crashed previous run can leave the managed location behind
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), table_name
    )
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    df = df.repartition(n_buckets, bucket_col)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)
