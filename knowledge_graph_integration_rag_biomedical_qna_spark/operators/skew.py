"""Explicit skew handling: salted join (manual complement to AQE skew-join).

AQE's skewJoin splits oversized shuffle partitions at runtime, but only for
sort-merge joins and only after a shuffle materializes the skew. When a key's
row count is known-pathological upfront (a hot CUI touching billions of
mentions), pre-salting avoids ever forming the hot partition:

    big side:   salt = pmod(xxhash64(row_key), S)      (spreads the hot key)
    small side: replicated S times (one copy per salt)
    join on (key, salt)                                 (S-way fan-out)

Join output is identical to the unsalted join — salting only changes the
physical distribution. `row_key` must be a column that varies within a join
key's rows (any unique-ish id); it does NOT need to be globally unique.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.config import CANON_SALT_BUCKETS


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    row_key: str,
    how: str = "inner",
    salt_buckets: int = CANON_SALT_BUCKETS,
) -> DataFrame:
    """Join `big` (skewed on `on`) with `small`, salted `salt_buckets` ways.

    Only joins whose output is invariant under small-side replication are
    allowed: 'inner' and 'left' (each big row carries exactly one salt, so
    unmatched big rows surface once). 'right'/'full' would surface every
    unmatched SMALL row salt_buckets times, and semi/anti project the wrong
    side — use AQE skew-join for those shapes (r4 review finding)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' (got {how!r}): other join "
            "types are not replication-invariant under small-side salting — "
            "use spark.sql.adaptive.skewJoin for them"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(row_key)), F.lit(salt_buckets)).cast("int")
    )
    salts = big.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
    salted_small = small.crossJoin(F.broadcast(salts))
    out_cols = [c for c in salted_big.columns if c != "_salt"] + [
        c for c in small.columns if c not in on
    ]
    return (
        salted_big.join(salted_small, on + ["_salt"], how)
        .select(*out_cols)
    )
