"""Pipeline API contract tests: one description executes identically in
batch and streaming, SQL and DataFrame steps compose, and misuse fails
loudly (SURVEY.md §2.1's source→transform→sink semantic is the unit
under test here, not any single query)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from data_ingestion_service_spark.pipeline import Pipeline


def _purchases_pipeline(sf_dir: str, sink: str | None) -> Pipeline:
    p = (
        Pipeline()
        .read_parquet(f"{sf_dir}/events.parquet")
        .transform(lambda df: df.filter(F.col("event_type") == "purchase"))
        .transform(lambda df: df.select("event_id", "user_id", "value"))
    )
    return p.write_parquet(sink) if sink else p.to_dataframe()


def test_batch_run_returns_sink_contents(spark, sf_dir):
    out = tempfile.mkdtemp(prefix="pl_batch_")
    got = _purchases_pipeline(sf_dir, f"{out}/sink").run(spark)
    direct = _purchases_pipeline(sf_dir, None).run(spark)
    assert sorted(r.event_id for r in got.collect()) == sorted(
        r.event_id for r in direct.collect()
    )
    assert set(got.columns) == {"event_id", "user_id", "value"}


def test_stream_run_equals_batch_run(spark, sf_dir):
    """Same description, both modes, same rows — the unification claim."""
    out_b = tempfile.mkdtemp(prefix="pl_b_")
    out_s = tempfile.mkdtemp(prefix="pl_s_")
    batch = _purchases_pipeline(sf_dir, f"{out_b}/sink").run(spark)
    stream = _purchases_pipeline(sf_dir, f"{out_s}/sink").run_stream(
        spark, checkpoint=f"{out_s}/ck"
    )
    assert sorted(r.event_id for r in stream.collect()) == sorted(
        r.event_id for r in batch.collect()
    )


def test_sql_and_dataframe_steps_compose(spark, sf_dir):
    p = (
        Pipeline()
        .read_parquet(f"{sf_dir}/orders.parquet")
        .sql("SELECT o_orderpriority, o_totalprice FROM {src}")
        .transform(lambda df: df.groupBy("o_orderpriority").count())
        .to_dataframe()
    )
    rows = p.run(spark).collect()
    assert {r["o_orderpriority"] for r in rows} == {
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    }


def test_misuse_fails_loudly(spark, sf_dir):
    with pytest.raises(ValueError, match="no source"):
        Pipeline().to_dataframe().run(spark)
    with pytest.raises(ValueError, match="source already set"):
        Pipeline().read_parquet("a").read_parquet("b")
    with pytest.raises(ValueError, match="no sink"):
        Pipeline().read_parquet(f"{sf_dir}/orders.parquet").run(spark)
    with pytest.raises(ValueError, match="materialized sink"):
        _purchases_pipeline(sf_dir, None).run_stream(spark, checkpoint="/tmp/x")


def test_expect_fail_raises_and_drop_filters(spark, sf_dir):
    from data_ingestion_service_spark.pipeline import ExpectationError

    base = (
        Pipeline()
        .read_parquet(f"{sf_dir}/customer.parquet")
        .expect("c_acctbal >= 0", on_violation="fail")
        .to_dataframe()
    )
    with pytest.raises(ExpectationError, match="violate expectation"):
        base.run(spark)

    dropped = (
        Pipeline()
        .read_parquet(f"{sf_dir}/customer.parquet")
        .expect("c_acctbal >= 0", on_violation="drop")
        .to_dataframe()
        .run(spark)
    )
    assert dropped.filter("c_acctbal < 0").count() == 0


def test_expect_blocks_streaming(spark, sf_dir):
    p = (
        Pipeline()
        .read_parquet(f"{sf_dir}/customer.parquet")
        .expect("c_acctbal >= 0", on_violation="fail")
        .write_parquet("/tmp/never")
    )
    with pytest.raises(ValueError, match="batch-only steps"):
        p.run_stream(spark, checkpoint="/tmp/never_ck")


def test_metrics_count_rows_per_stage(spark, sf_dir):
    import tempfile

    out = tempfile.mkdtemp(prefix="pl_metrics_")
    p = (
        Pipeline()
        .read_parquet(f"{sf_dir}/customer.parquet")
        .transform(lambda df: df.filter(F.col("c_acctbal") >= 0))
        .transform(lambda df: df.select("c_custkey", "c_mktsegment"))
        .write_parquet(f"{out}/sink")
        .with_metrics()
    )
    sink = p.run(spark)
    m = p.last_metrics
    total = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    kept = sink.count()
    assert m["source"] == total
    assert m["step_1"] == kept and m["step_2"] == kept
    assert m["step_1"] < total, "filter should have dropped negative balances"


def test_expect_schema_contract(spark, sf_dir):
    from data_ingestion_service_spark.pipeline import ExpectationError

    good = (
        Pipeline()
        .read_parquet(f"{sf_dir}/nation.parquet")
        .expect_schema("n_nationkey int, n_name string, n_regionkey int")
        .to_dataframe()
    )
    assert good.run(spark).count() == 25

    bad = (
        Pipeline()
        .read_parquet(f"{sf_dir}/nation.parquet")
        .expect_schema("n_nationkey bigint, n_name string")
        .to_dataframe()
    )
    with pytest.raises(ExpectationError, match="type-drift=\\['n_nationkey'\\]"):
        bad.run(spark)


def test_dedupe_deterministic_and_streamable(spark, sf_dir):
    # Deterministic batch variant: earliest event per user survives.
    det = (
        Pipeline()
        .read_parquet(f"{sf_dir}/events.parquet")
        .dedupe(["user_id"], order_by="event_id")
        .to_dataframe()
        .run(spark)
    )
    per_user_min = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.min("event_id").alias("event_id"))
    )
    assert sorted((r.user_id, r.event_id) for r in det.collect()) == sorted(
        (r.user_id, r.event_id) for r in per_user_min.collect()
    )
    # Streaming-capable variant: key cardinality preserved, mode allowed.
    import tempfile

    out = tempfile.mkdtemp(prefix="pl_dd_")
    streamed = (
        Pipeline()
        .read_parquet(f"{sf_dir}/events.parquet")
        .transform(lambda df: df.select("event_id", "user_id"))
        .dedupe(["user_id"])
        .write_parquet(f"{out}/sink")
        .run_stream(spark, checkpoint=f"{out}/ck")
    )
    assert streamed.count() == per_user_min.count()
    # order_by variant must refuse streaming:
    with pytest.raises(ValueError, match="batch-only steps"):
        (
            Pipeline()
            .read_parquet(f"{sf_dir}/events.parquet")
            .dedupe(["user_id"], order_by="event_id")
            .write_parquet(f"{out}/never")
            .run_stream(spark, checkpoint=f"{out}/never_ck")
        )


def test_stream_restart_resumes_exactly_once(spark, sf_dir):
    """The Pipeline's streaming mode inherits checkpoint recovery: stop
    after half the input, add the rest, rerun the SAME description on
    the same checkpoint — the sink must equal one batch pass (no
    re-read of half one, no loss of half two)."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="pl_restart_")
    src = spark.read.parquet(f"{sf_dir}/events.parquet")
    src.filter("event_id % 2 = 0").coalesce(1).write.parquet(f"{work}/h1")
    src.filter("event_id % 2 = 1").coalesce(1).write.parquet(f"{work}/h2")
    import glob as g

    import os

    os.makedirs(f"{work}/replay")
    shutil.copy(g.glob(f"{work}/h1/part-*.parquet")[0], f"{work}/replay/a.parquet")

    def pipe() -> Pipeline:
        return (
            Pipeline()
            .read_parquet(f"{work}/replay")
            .transform(lambda df: df.select("event_id", "event_type"))
            .write_parquet(f"{work}/sink", mode="append")
        )

    first = pipe().run_stream(spark, checkpoint=f"{work}/ck")
    n_first = first.count()
    shutil.copy(g.glob(f"{work}/h2/part-*.parquet")[0], f"{work}/replay/b.parquet")
    second = pipe().run_stream(spark, checkpoint=f"{work}/ck")
    assert n_first == src.filter("event_id % 2 = 0").count()
    assert second.count() == src.count(), "restart lost or duplicated rows"
