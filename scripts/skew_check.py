"""Observe the 100 TB skew guards firing on ORGANICALLY-shaped data
(VERDICT r4 item 4): the skewed stress tier (scripts/gen_scale.py with
GEN_SCALE_SKEW=1 — one user owns 80% of events, one source owns 80% of
documents) drives the same join/window shapes the posture tests force
with synthetic thresholds, and this script records what Spark actually
does with them:

  1. events ⋈ customer on the hot user_id as a sort-merge join under
     production-realistic AQE thresholds -> expects `skew=true` split
     markers in the final adaptive plan;
  2. the salted-join pattern (operators/advanced.py's q_skew_join_salted
     idiom) over the same hot key -> expects per-salt partial counts to
     spread the hot key across tasks;
  3. q_pack_sequences' packing window on the 80%-src0 documents ->
     expects the dominant source to pack through many (source, shard)
     window partitions, not one.

Run:  python scripts/skew_check.py [skew_dir]   (default .stress/sf1skew)
Exit 0 iff all three observations hold; prints one line each.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_ingestion_service_spark.registry import QUERIES, load_all_operators
from data_ingestion_service_spark.session import get_spark

SKEW_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.stress/sf1skew"


def main() -> int:
    load_all_operators()
    spark = get_spark(app_name="skew-check", shuffle_partitions=32)
    ok = True

    # -- 1. AQE skew-split on the hot-user join ---------------------------
    # Thresholds proportionate to this 1M-row tier: the hot user's 800k
    # (user_id, value) rows shuffle-COMPRESS to well under 1MB (the id
    # column is a constant — lz4 eats it), so the production-default
    # 256MB advisory would never trip here; 256KB advisory / factor 1 is
    # the same ratio-to-partition-size the defaults give real GB-scale
    # partitions. What is being observed is detection on ORGANIC data
    # shape — not a forced synthetic like the posture test.
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        ev = spark.read.parquet(f"{SKEW_DIR}/events.parquet")
        cust = spark.read.parquet(f"{SKEW_DIR}/customer.parquet")
        # The JOIN itself is the terminal shuffle consumer here:
        # OptimizeSkewedJoin declines to split when a downstream
        # operator (e.g. a groupBy on the join key's exchange) still
        # requires the hash distribution — splitting would break it.
        # Materializing the join output directly is the shape where the
        # guard can and must fire (same as an enrich-and-write stage).
        j = ev.join(cust, ev.user_id == cust.c_custkey).select(
            "value", "c_mktsegment"
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        hit = "skew=true" in plan
        ok &= hit
        print(f"[{'OK' if hit else 'FAIL'}] AQE skew-split on hot-user SMJ: "
              f"skew=true {'present' if hit else 'ABSENT'} in adaptive plan")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # -- 2. Salting spreads the hot key -----------------------------------
    ev = spark.read.parquet(f"{SKEW_DIR}/events.parquet")
    n_salts = 16
    salted = ev.withColumn("salt", (F.col("event_id") % n_salts).cast("int"))
    per_salt = (
        salted.filter(F.col("user_id") == 1)
        .groupBy("user_id", "salt")
        .agg(F.count(F.lit(1)).alias("partial"))
    )
    rows = per_salt.collect()
    spread = len(rows)
    mx = max(r.partial for r in rows)
    total = sum(r.partial for r in rows)
    balanced = spread == n_salts and mx < total * 0.25
    ok &= balanced
    print(f"[{'OK' if balanced else 'FAIL'}] salted agg: hot user's {total} "
          f"rows over {spread}/{n_salts} salts, max shard {mx}")

    # -- 3. Dominant source packs through many window partitions ----------
    packed = QUERIES["q_pack_sequences"](spark, SKEW_DIR)
    shards = (
        packed.filter(F.col("source") == "src0")
        .select("shard")
        .distinct()
        .count()
    )
    sharded = shards > 100
    ok &= sharded
    print(f"[{'OK' if sharded else 'FAIL'}] q_pack_sequences: dominant "
          f"source src0 packs via {shards} window partitions")

    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
