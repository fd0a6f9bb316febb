"""Shared alert definitions served to both batch and streaming keys.

The error-share health monitor exists twice on purpose — as a batch
backfill/audit (`q_error_rate_alert`, operators/reporting.py) and as a
live tumbling-window stream (`q_stream_error_rate`,
streaming/stream_queries.py). What must NOT exist twice is the alert
definition itself: one threshold constant and one SQL fragment here are
the single source of truth (r5 verdict item 7); both keys — and both
engines, Spark and the DuckDB oracle — derive from these. Changing the
paging threshold is a one-line change that moves batch audit, live
monitor, and both oracles in lockstep.

The share is computed in integer basis points (`* 10000` then integer
division), never a float ratio: a float share can round differently
across engines at the exact threshold boundary and flip the alert bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Paging threshold: alert when errors exceed 250 basis points (2.5%) of
# events in the hour.
ERROR_ALERT_BP = 250

# Oracle-side (DuckDB) fragments. Both oracles GROUP BY the hour, count
# events with count(*), and derive errors with this sum — the fragments
# inline into each oracle's SELECT list.
_ORACLE_ERR_SUM = "sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)"
ORACLE_ERROR_BP_EXPR = (
    f"CAST({_ORACLE_ERR_SUM} * 10000 // count(*) AS BIGINT) AS error_bp"
)
ORACLE_ERROR_ALERT_EXPR = (
    f"({_ORACLE_ERR_SUM} * 10000 // count(*)) > {ERROR_ALERT_BP} AS alert"
)


def is_error() -> Column:
    """1L when the event is an error, else 0L — the shared numerator."""
    return (F.col("event_type") == "error").cast("long")


def error_bp(n_errors: str = "n_errors", n_events: str = "n_events") -> Column:
    """Integer basis-point error share over pre-aggregated counts.

    `div` (integer division), matching the oracle's `//` — exact at any
    count magnitude, no float rounding at the threshold boundary.
    """
    return F.expr(f"{n_errors} * 10000 div {n_events}")


def error_alert(bp: Column) -> Column:
    """The paging predicate over an `error_bp` column."""
    return bp > ERROR_ALERT_BP
