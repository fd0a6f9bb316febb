"""Engine-vs-oracle parity for every registered query (SURVEY.md §5).

Replicates the driver's t2 protocol: run the Spark query and the DuckDB
oracle on the same tables, then compare row count, column-name set, and
order-insensitively compared values (columns sorted by name, rows sorted
by their full tuple). Exact equality is required — the queries themselves
round floats in-query on both sides, so any mismatch here would also flip
the driver's hash.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from data_ingestion_service_spark.registry import ORACLES, QUERIES, load_all_operators

load_all_operators()

ORACLE_KEYS = sorted(ORACLES)
ROWS_ONLY_KEYS = sorted(set(QUERIES) - set(ORACLES))


def _norm_cell(v):
    # repr-based (type-sensitive) like scripts/driver_sim.py: an int vs
    # float result (e.g. DuckDB sign() vs Spark signum) must NOT compare
    # equal the way Python's -1 == -1.0 would.
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse -0.0 vs 0.0 and representation noise at far ulps
        return repr(round(v, 9) + 0.0)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return repr(v)


def _sort_key(row):
    return tuple((str(type(c)), str(c)) for c in row)


def normalize(columns, rows):
    """Sort columns by name, rows by value — order-insensitive compare."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(
        (tuple(_norm_cell(row[i]) for i in order) for row in rows), key=_sort_key
    )
    return cols, data


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_query_matches_oracle(key, spark, oracle_con, sf_dir):
    sdf = QUERIES[key](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    cur = oracle_con.execute(ORACLES[key])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{key}: column names differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{key}: row count differs: spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    _, s_data = normalize(spark_cols, [tuple(r) for r in spark_rows])
    _, d_data = normalize(duck_cols, duck_rows)
    mismatches = [
        (i, s, d) for i, (s, d) in enumerate(zip(s_data, d_data)) if s != d
    ]
    assert not mismatches, (
        f"{key}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("key", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(key, spark, sf_dir):
    sdf = QUERIES[key](spark, sf_dir)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0
