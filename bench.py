"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query wall times.

Methodology: one reused SparkSession (per-query session setup would swamp
ms-scale queries — SURVEY.md §6); a single untimed warm-up query compiles
codegen paths and primes the JVM; inputs stay on parquet (no pre-caching,
scans are part of the measurement). Streaming queries include their full
replay + drain time.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped",
    "q5_regional_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q_window_rank",
    "q_running_revenue",
    "q_rollup_orders",
    "q_semi_anti",
    "q_events_tumbling",
    "q_events_json",
    "q_doc_tokens",
    "q_dedup_docs",
    "q_knn_self",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from data_ingestion_service_spark.registry import QUERIES, load_all_operators
    from data_ingestion_service_spark.session import get_spark

    load_all_operators()
    spark = get_spark(app_name="ingestion-engine-bench")

    # Warm-up: JVM + codegen + parquet footer caches (untimed).
    QUERIES["q6_forecast_revenue"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for key in HEADLINE:
        if key not in QUERIES:
            continue
        t0 = time.monotonic()
        QUERIES[key](spark, sf_dir).collect()
        timings[key] = round(time.monotonic() - t0, 4)

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
