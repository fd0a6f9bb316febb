"""Physical-plan regression guards for the 100 TB posture (SURVEY.md §4).

Correctness tests prove the answers match; these prove the *plans* stay
scalable: filters reach the parquet scan (row-group skipping), dimension
joins broadcast (no fact-side shuffle), top-k avoids a global sort, and
scans prune columns. A refactor that silently regresses any of these
would pass correctness and get slower at scale — this is the tripwire.
"""

from __future__ import annotations

import pytest

from data_ingestion_service_spark.registry import QUERIES, load_all_operators

load_all_operators()


def formatted_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = formatted_plan(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters: [" in plan
    # every predicate of the conjunctive filter reaches the scan
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        pushed_lines = [l for l in plan.splitlines() if "PushedFilters" in l]
        assert any(frag in l for l in pushed_lines), f"{frag} not pushed: {pushed_lines}"


def test_q6_column_pruning(spark, sf_dir):
    plan = formatted_plan(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, "no ReadSchema in plan"
    # q6 needs 4 columns; a full-width scan (16+ cols) means pruning broke
    assert "l_extendedprice" in read_schema[0]
    assert "l_returnflag" not in read_schema[0], f"scan too wide: {read_schema[0]}"


def test_q3_uses_broadcast_join(spark, sf_dir):
    plan = formatted_plan(QUERIES["q3_top_unshipped"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "dim join degraded to SMJ at fixture scale"


def test_q3_topk_avoids_global_sort(spark, sf_dir):
    plan = formatted_plan(QUERIES["q3_top_unshipped"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = formatted_plan(QUERIES["q1_pricing_summary"](spark, sf_dir))
    tree = plan.split("\n\n")[0]  # operator tree only (details repeat names)
    # partial (map-side) + final hash agg around a single exchange
    assert tree.count("HashAggregate") == 2
    assert tree.count("Exchange") == 1


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    from data_ingestion_service_spark.operators.engine_features import (
        bucketed_join_plan,
    )

    plan = bucketed_join_plan(spark, sf_dir)
    assert "SortMergeJoin" in plan
    # co-located bucketed sides: the join must read buckets directly,
    # with no shuffle exchange on either input
    assert "Exchange hashpartitioning" not in plan, plan


@pytest.mark.parametrize("key", ["q1_pricing_summary", "q5_regional_revenue"])
def test_whole_stage_codegen(spark, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    df.collect()  # codegen markers only appear on the final (executed) AQE plan
    simple = df._jdf.queryExecution().simpleString()
    # codegen'd plans mark stages with '*(n)' prefixes
    assert "*(" in simple, f"no WholeStageCodegen in {key}: {simple[:400]}"
