"""Simulate the driver's verify flow end-to-end (the repo's real surface).

Mirrors the protocol in __spark_entry__.py's docstring: a plain
SparkSession (none of our tuned confs), entry() smoke at sf0.001, then
every queries()[k] vs oracle_sql()[k] via DuckDB at sf0.01 — row count,
column-name schema, and an order-insensitive value hash over columns
sorted by name. Prints one line per query and a final summary.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        v = round(v, 9) + 0.0
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return repr(v)


def value_hash(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"[smoke] entry() OK: {len(rows)} rows, schema={df.columns}")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for key in sorted(qs):
        t0 = time.monotonic()
        try:
            sdf = qs[key](spark, SF_CORRECT)
            s_rows = [tuple(r) for r in sdf.collect()]
            s_cols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"[FAIL] {key}: spark raised {exc}")
            n_fail += 1
            continue
        el = time.monotonic() - t0
        if key not in oracles:
            print(f"[rows-only] {key}: {len(s_rows)} rows in {el:.2f}s")
            n_rows_only += 1
            continue
        cur = con.execute(oracles[key])
        d_cols = [d[0] for d in cur.description]
        d_rows = cur.fetchall()
        ok_schema = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        sh, dh = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
        ok_hash = sh == dh
        if ok_schema and ok_count and ok_hash:
            print(f"[OK]   {key}: {len(s_rows)} rows, hash={sh} in {el:.2f}s")
            n_pass += 1
        else:
            print(
                f"[FAIL] {key}: schema={ok_schema} count={ok_count} "
                f"({len(s_rows)} vs {len(d_rows)}) hash={sh} vs {dh}"
            )
            n_fail += 1
    print(f"\nsummary: {n_pass} hash-match, {n_rows_only} rows-only, {n_fail} FAIL")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
