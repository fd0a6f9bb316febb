"""Profile the cold-vs-warm wall gap for the bench's store-backed groups.

VERDICT r9 item 5: llm_ops_cold_total 22.1s vs 9.0s warm and
ml_feature_ops_cold_total 20.0s vs 15.0s — attribute the delta to
(a) Python-worker spin-up, (b) Arrow-kernel / UDF first-call JIT,
(c) session-store first-build, or (d) plain first-scan I/O, then decide
what can be amortized.

Method: wrap ``session_persisted`` so every store BUILD (the build() call
plus the materializing persist) is timed and attributed to the bench key
that triggered it, run each group key once COLD then once WARM on a fresh
session, and print per-key cold/warm/delta alongside the store-build walls
charged to it.  Python-worker spin-up is measured up front the same way
bench.py does.

Usage: python scripts/profile_cold.py [llm|mlf|s5|r6 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo root)
from data_ingestion_service_spark import session as sess  # noqa: E402
from data_ingestion_service_spark.session import get_spark  # noqa: E402
from __spark_entry__ import queries  # noqa: E402

GROUPS = {
    "llm": bench.LLM_OPS,
    "r6": bench.CORPUS_OPS_R6,
    "mlf": bench.ML_FEATURE_OPS,
    "s5": bench.SESSION5_OPS,
}

BUILDS: list[dict] = []
_CURRENT_KEY: list[str] = ["<preamble>"]

_orig = sess.session_persisted


def _timed_session_persisted(spark, key, build):
    def timed_build():
        t0 = time.monotonic()
        df = build()
        BUILDS.append(
            {
                "store": str(key)[:120],
                "bench_key": _CURRENT_KEY[-1],
                "build_plan_sec": round(time.monotonic() - t0, 3),
            }
        )
        return df

    return _orig(spark, key, timed_build)


def main() -> None:
    sess.session_persisted = _timed_session_persisted
    # Patch every module-level import of the symbol too.
    import data_ingestion_service_spark as pkg

    for modname, mod in list(sys.modules.items()):
        if modname.startswith(pkg.__name__) and hasattr(
            mod, "session_persisted"
        ):
            mod.session_persisted = _timed_session_persisted

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    QUERIES = queries()

    # Python-worker spin-up, same probe as bench.py: repartition(cpus)
    # so EVERY worker forks here — a narrower probe (e.g. range(32)
    # without the repartition) only forks a couple of workers and the
    # remaining ~30 forks land on whichever key runs first, inflating
    # its "cold" delta by ~5s of harness artifact.
    cpus = spark.sparkContext.defaultParallelism
    t0 = time.monotonic()
    spark.range(cpus).repartition(cpus).mapInPandas(
        lambda batches: batches, "id long"
    ).count()
    worker_warmup = round(time.monotonic() - t0, 3)
    print(f"python_worker_warmup_sec: {worker_warmup}")

    which = sys.argv[1:] or ["llm", "mlf", "s5", "r6"]
    for gname in which:
        keys = [k for k in GROUPS[gname] if k in QUERIES]
        print(f"\n=== group {gname} ({len(keys)} keys) ===")
        rows = []
        for key in keys:
            _CURRENT_KEY.append(key)
            n_builds_before = len(BUILDS)
            t0 = time.monotonic()
            QUERIES[key](spark, sf_dir).collect()
            cold = time.monotonic() - t0
            t0 = time.monotonic()
            QUERIES[key](spark, sf_dir).collect()
            warm = time.monotonic() - t0
            _CURRENT_KEY.pop()
            stores = BUILDS[n_builds_before:]
            rows.append(
                {
                    "key": key,
                    "cold": round(cold, 3),
                    "warm": round(warm, 3),
                    "delta": round(cold - warm, 3),
                    "store_builds": stores,
                }
            )
        rows.sort(key=lambda r: -r["delta"])
        for r in rows:
            stores = "; ".join(
                f"{b['store']}={b['build_plan_sec']}" for b in r["store_builds"]
            )
            print(
                f"{r['key']:<28} cold={r['cold']:7.3f} warm={r['warm']:7.3f}"
                f" delta={r['delta']:7.3f}  {stores}"
            )
        print(
            f"group {gname}: cold_total="
            f"{round(sum(r['cold'] for r in rows), 2)} warm_total="
            f"{round(sum(r['warm'] for r in rows), 2)}"
        )

    with open("/tmp/profile_cold_builds.json", "w") as f:
        json.dump(BUILDS, f, indent=1)
    print("\nstore-build log -> /tmp/profile_cold_builds.json")


if __name__ == "__main__":
    main()
