"""Phase isolation for the steady KG pipeline rep (guide §1.4: noop sink).

Reconstructs bench.py's steady x20 input (big_tr) and times each prefix of
the per-rep dataflow so optimization targets the dominant phase:
  1. parquet scan only
  2. + repartition(conv_id) + window dedup + empty filter (assemble_turns)
  3. + mapInArrow collapsed extraction
  4. the full steady rep (persist, kg_edges.count + kg_nodes.count, unpersist)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(spark, label, action, reps=3):
    spark.sparkContext.setJobDescription(label)
    action()  # warm
    best = None
    for _ in range(reps):
        t0 = time.time()
        action()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{label}: {best:.3f}s", file=sys.stderr)
    return best


def noop(df):
    return lambda: df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    from pyspark.sql import functions as F

    from knowledge_graph_integration_rag_biomedical_qna_spark.operators.extraction import (
        extract_collapsed_df,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.operators.turn_assembly import (
        assemble_turns,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.plans.pipeline import (
        broadcast_alias_keys,
        build_kg,
    )
    from knowledge_graph_integration_rag_biomedical_qna_spark.session import get_spark
    from knowledge_graph_integration_rag_biomedical_qna_spark.sources.synth import (
        synth_aliases,
        synth_transcripts,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="steady_probe", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    big = (
        synth_transcripts(docs)
        .crossJoin(spark.range(20).select(F.col("id").alias("rep")))
        .select(
            F.concat_ws("_", "conv_id", "rep").alias("conv_id"),
            "turn_idx", "role", "text", "tool", "ts",
        )
    )
    big.repartition(64).write.mode("overwrite").parquet("/tmp/steady_probe_transcripts")
    big_tr = spark.read.parquet("/tmp/steady_probe_transcripts")
    print("turns:", big_tr.count(), file=sys.stderr)
    aliases = synth_aliases(spark)
    alias_index = broadcast_alias_keys(spark, aliases)

    timed(spark, "1 scan only", noop(big_tr))
    turns = assemble_turns(big_tr)
    timed(spark, "2 + assemble_turns", noop(turns))
    unified = extract_collapsed_df(turns, alias_index)
    timed(spark, "3 + collapsed extraction", noop(unified))

    kg = build_kg(spark, big_tr, aliases, persist=False, alias_index=alias_index)
    cached = [df for df in (kg.unified, kg.mention_stats, kg.resolution) if df is not None]

    def steady_rep():
        for df in cached:
            df.persist()
        kg.kg_edges.count()
        kg.kg_nodes.count()
        for df in cached:
            df.unpersist()

    timed(spark, "4 full steady rep", steady_rep)
    spark.stop()


if __name__ == "__main__":
    main()
