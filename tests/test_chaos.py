"""Chaos-injection contract (the r11 task-retry determinism rung).

The full-registry proof lives in docs/validation/retry_sim_r11.log
(356/356 under SPARK_GRAFT_CHAOS=retry on local[16,4], hash-identical
to the standard run); these unit tests pin the injector's contract so
it cannot silently become a no-op (which would hollow out the rung) or
start firing when disabled (which would break every normal run).
"""

from __future__ import annotations

import pytest

from data_ingestion_service_spark import chaos


class _FakeTaskContext:
    def __init__(self, attempt: int):
        self._attempt = attempt

    def attemptNumber(self) -> int:
        return self._attempt

    def partitionId(self) -> int:
        return 3


def test_noop_when_disabled(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_CHAOS", raising=False)
    chaos.maybe_fail("unit")  # must not raise, even inside a task


def test_noop_on_driver(monkeypatch):
    # TaskContext.get() is None driver-side: enabling chaos must never
    # break driver-side code paths that happen to import a kernel.
    monkeypatch.setenv("SPARK_GRAFT_CHAOS", "retry")
    monkeypatch.setattr("pyspark.TaskContext.get", staticmethod(lambda: None))
    chaos.maybe_fail("unit")


def test_first_attempt_raises_retry_passes(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_CHAOS", "retry")
    monkeypatch.setattr(
        "pyspark.TaskContext.get",
        staticmethod(lambda: _FakeTaskContext(attempt=0)),
    )
    with pytest.raises(RuntimeError, match=r"chaos\[unit\].*partition 3"):
        chaos.maybe_fail("unit")
    monkeypatch.setattr(
        "pyspark.TaskContext.get",
        staticmethod(lambda: _FakeTaskContext(attempt=1)),
    )
    chaos.maybe_fail("unit")  # the retried attempt must succeed
