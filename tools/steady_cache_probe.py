"""One-off probe for VERDICT r3 item 7: steady-pipeline persist cost.

Times build_kg steady (x20 replicate at $1=sf_dir) under cache variants,
interleaved A/B/C (this VM's wall variance makes blocked comparisons
meaningless):
  A. persist() with the default compressed columnar cache (status quo)
  B. persist() with spark.sql.inMemoryColumnarStorage.compressed=false
  C. no persist (extraction subtree re-executes per consumer; the
     repartition exchange below it is still reused within each query)

Usage: python tools/steady_cache_probe.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from knowledge_graph_integration_rag_biomedical_qna_spark.plans.pipeline import build_kg
    from knowledge_graph_integration_rag_biomedical_qna_spark.session import get_spark
    from knowledge_graph_integration_rag_biomedical_qna_spark.sources.synth import (
        synth_aliases,
        synth_transcripts,
    )

    spark = get_spark(app_name="steady_cache_probe", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = (
        synth_transcripts(docs)
        .crossJoin(spark.range(20).select(F.col("id").alias("rep")))
        .select(
            F.concat_ws("_", "conv_id", "rep").alias("conv_id"),
            "turn_idx", "role", "text", "tool", "ts",
        )
    )
    big.repartition(64).write.mode("overwrite").parquet("/tmp/steady_cache_probe")
    tr = spark.read.parquet("/tmp/steady_cache_probe")
    n = tr.count()
    aliases = synth_aliases(spark)

    def run(persist: bool, compressed: bool) -> float:
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed",
                       "true" if compressed else "false")
        t0 = time.time()
        kg = build_kg(spark, tr, aliases, persist=persist)
        kg.kg_edges.count()
        kg.kg_nodes.count()
        dt = time.time() - t0
        kg.unpersist()
        spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "true")
        return dt

    variants = {
        "A_persist_compressed": lambda: run(True, True),
        "B_persist_uncompressed": lambda: run(True, False),
        "C_no_persist": lambda: run(False, True),
    }
    # warm
    run(True, True)
    best: dict[str, float] = {}
    for _ in range(reps):
        for name, fn in variants.items():  # interleaved
            dt = fn()
            best[name] = min(best.get(name, 1e9), dt)
            print(f"{name}: {dt:.3f}s (best {best[name]:.3f}s)", flush=True)
    print({k: round(v, 3) for k, v in best.items()}, {"turns": n, "cpus": cpus})
    spark.stop()


if __name__ == "__main__":
    main()
