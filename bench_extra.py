"""Round-7 optimization harness (bench.py itself is FROZEN for measurement).

Times individual registry queries with the same count()-based methodology as
bench.py, optionally via the noop sink (guide §1.4), and dumps
.explain("formatted") per query for plan audits. Never used by the driver.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--noop] [--plans OUTDIR] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q5_join_breadth",
    "q3_order_revenue",
    "t1_topk_per_group",
    "p4_percentile_filter",
    "a7_canonical_grouping",
    "ann_cosine_topk",
    "text_fingerprint",
    "sessionize_events",
    "kg_pipeline_full",
    "dedup_minhash_pairs",
    "dedup_minhash_pairs_fast",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true", help="time via noop sink instead of count()")
    ap.add_argument("--plans-only", action="store_true", help="dump plans, skip timing")
    ap.add_argument("--plans", default=None, help="directory to write <query>.txt formatted plans")
    ap.add_argument("--suffix", default="", help="suffix for plan filenames, e.g. _before")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    from knowledge_graph_integration_rag_biomedical_qna_spark.entry_queries import REGISTRY
    from knowledge_graph_integration_rag_biomedical_qna_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.range(1000).selectExpr("sum(id)").collect()
    # same warm-up as bench.py so cold-JVM effects don't pollute comparisons
    REGISTRY["kg_pipeline_full"][0](spark, "/root/testdata/sf0.001").count()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        fn, _ = REGISTRY[name]
        # oracle-free variant when available: don't pay materialize cost here
        fn = getattr(fn, "__wrapped__", fn)
        if args.plans:
            import contextlib
            import io

            df = fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        if args.plans_only:
            continue

        def run_once():
            d = fn(spark, args.sf)
            if args.noop:
                d.write.format("noop").mode("overwrite").save()
            else:
                d.count()

        spark.sparkContext.setJobDescription(f"{name} warm")
        run_once()  # warm
        samples = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            run_once()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"best": min(samples), "samples": samples}
        print(f"{name}: best={min(samples)} samples={samples}", file=sys.stderr)

    print(json.dumps({"sf": args.sf, "noop": args.noop, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
