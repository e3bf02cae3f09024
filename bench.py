"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is forced end-to-end with the noop sink (full execution, no
collect/driver materialization cost in the measurement).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_entity_resolution_spark.plans.registry import all_queries
from pyspark_entity_resolution_spark.session import get_spark

HEADLINE = [
    "tpch_q1_pricing_summary",
    "join_agg_revenue_by_segment",
    "tpch_q6_forecast_revenue",
    "levenshtein_blocked_pairs",
    "er_flagship_doc_matching",
    "connected_components_labels",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_bruteforce_topk",
    "ann_lsh_bucketed",
    "events_tumbling_window",
    "events_sessionization",
    "orders_topk_per_customer",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(match.group(1).rstrip(".")) if match else None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # JVM/codegen warmup outside the measurement
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = specs[name].fn
        print(f"[bench] {name} ...", file=sys.stderr, flush=True)
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - start, 3)
        print(f"[bench] {name}: {elapsed}s", file=sys.stderr, flush=True)
        per_query[name] = elapsed
        total += elapsed

    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
