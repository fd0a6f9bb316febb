"""Shared batch↔stream model definitions (the alerts.py pattern, r5
verdict item 7, applied to learned models): a model computed by a batch
key and SCORED inside a streaming plan must have exactly one definition,
or the batch audit and the live monitor silently drift apart.

Currently: the per-event-type discrete-p99 threshold model. The batch
form is q_latency_percentiles' rank selection (operators/mining.py);
the streaming consumer is q_stream_model_score, which broadcast-joins
this table into a live plan. Both engines and both execution modes
derive from the construction here — integer cents, rank ceil(q·n),
event_id tiebreak — so the threshold is bit-identical everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Quantile of the threshold model (discrete — the element at rank
# ceil(q*n), never an interpolated blend).
SCORE_QUANTILE = 0.99


def value_cents() -> "F.Column":
    return F.round(F.col("value") * 100).cast("bigint")


def p99_threshold_model(events: DataFrame) -> DataFrame:
    """(event_type, p99_cents) learned from a batch of events."""
    v = events.select("event_type", "event_id", value_cents().alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("rn")
                == F.ceil(F.lit(SCORE_QUANTILE) * F.col("n")).cast("bigint"),
                F.col("cents"),
            )
        ).alias("p99_cents")
    )


# Oracle-side (DuckDB) CTE body producing the identical model table.
ORACLE_P99_MODEL_CTE = f"""
ranked AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(round(value * 100) AS BIGINT),
                                     event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
model AS (
  SELECT event_type,
         min(CASE WHEN rn = CAST(ceil({SCORE_QUANTILE} * n) AS BIGINT)
                  THEN cents END) AS p99_cents
  FROM ranked GROUP BY event_type
)
"""
