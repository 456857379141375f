"""Local stand-in for the driver's correctness gate: run every registry query
on Spark AND its DuckDB oracle SQL at a given sf dir, compare row count,
column names, and order-insensitive values (floats rounded to 9dp).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        if v == 0:
            v = 0.0  # -0.0 and 0.0 are semantically equal; don't print '-0'
        return f"{round(v, 9):.9f}"
    if isinstance(v, bool):
        return str(int(v))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{round(float(v), 9):.9f}"
    except Exception:
        pass
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from knowledge_graph_integration_rag_biomedical_qna_spark.entry_queries import REGISTRY

    if os.environ.get("PLAIN_SESSION"):
        # driver-sim mode: default-config session (no UTC pin, no AQE tuning,
        # 200 shuffle partitions) — queries must be config-independent
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("plain").getOrCreate()
    else:
        from knowledge_graph_integration_rag_biomedical_qna_spark.session import get_spark

        spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rows_only = 0
    for name, (fn, sql) in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"rows  {name}: {len(rows)} rows (no SQL oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            # materialized-oracle SQL is registered against the DRIVER's gate
            # scale (sf0.01); when checking another scale, retarget the
            # read_parquet path to that scale's materialization (the query
            # wrapper just refreshed it for this sf_dir)
            from knowledge_graph_integration_rag_biomedical_qna_spark.oracle.materialize import (
                GATE_SF_TAG,
            )

            tag = os.path.basename(os.path.normpath(sf_dir))
            if tag != GATE_SF_TAG:
                sql = sql.replace(f"/current/{GATE_SF_TAG}/", f"/current/{tag}/")
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(cols) != sorted(ocols):
            ok = False
            msgs.append(f"cols {sorted(cols)} vs {sorted(ocols)}")
        if len(rows) != len(orows):
            ok = False
            msgs.append(f"rowcount {len(rows)} vs {len(orows)}")
        if ok:
            a = canon(rows, cols)
            b = canon(orows, ocols)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                msgs.append(f"values differ, first diffs: {diff}")
        if ok:
            print(f"PASS  {name}: {len(rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: {'; '.join(msgs)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
