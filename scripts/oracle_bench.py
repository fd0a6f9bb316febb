"""Time the DuckDB oracle side of the headline queries at a given sf dir
(BASELINE.md methodology: N runs, median) so BENCH numbers can be
compared against the oracle floor at tiers beyond the driver's sf0.1 —
the first point where per-query compute outweighs Spark's scheduling
floor and the 2x bar is meaningful (VERDICT r3 item 5).

Usage:
  ORACLE_BENCH_SF_DIR=/root/repo/.stress/sf1 python scripts/oracle_bench.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("ORACLE_BENCH_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("ORACLE_BENCH_RUNS", "3"))
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

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
    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    timings: dict[str, float] = {}
    for key in HEADLINE:
        sql = oracles[key]
        con.execute(sql).fetchall()  # warm (page cache + plan)
        samples = []
        for _ in range(RUNS):
            t0 = time.monotonic()
            con.execute(sql).fetchall()
            samples.append(time.monotonic() - t0)
        timings[key] = round(statistics.median(samples), 4)
    print(
        json.dumps(
            {
                "metric": "duckdb_oracle_headline_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf_dir": SF_DIR,
                "threads": con.execute("SELECT current_setting('threads')").fetchone()[0],
            }
        )
    )


if __name__ == "__main__":
    main()
