"""Test-only fault injection — the r11 task-retry determinism rung.

``SPARK_GRAFT_CHAOS=retry`` makes every instrumented Python-executed
task (the shared Arrow vector kernels, the corpus signature kernel, the
stateful ``applyInPandasWithState`` updates) raise on its FIRST attempt
(``TaskContext.attemptNumber() == 0``), so the scheduler re-executes
it. Re-execution is the classic killer of non-idempotent state and
addition-order-dependent folds — a 1000-executor cluster retries and
speculates tasks all day, so every registered result must be invariant
to it. The rung: run the full sim under this knob with a master that
permits retries (``local[N,4]``; plain ``local[N]`` has
``spark.task.maxFailures=1`` and fails the whole job) and require
per-key hashes identical to the standard run.

Scope note: pure-JVM tasks (parquet scans/writes, codegen'd
aggregations) cannot be failed from Python without a custom jar; the
companion speculation rung (``spark.speculation=true`` at quantile 0)
covers re-execution of those by racing duplicate attempts.

Off (the default), ``maybe_fail`` is one env lookup per Arrow batch —
negligible next to the batch itself.
"""

from __future__ import annotations

import os


def maybe_fail(tag: str = "") -> None:
    """Raise on the first attempt of the current task under chaos mode.

    Called from inside executor-side Python (Arrow batch iterators,
    grouped-state updates), where ``TaskContext.get()`` is live. A task
    may pass through several instrumented batches; only attempt 0
    raises, so each task fails exactly once and the retry proceeds.
    """
    if os.environ.get("SPARK_GRAFT_CHAOS") != "retry":
        return
    from pyspark import TaskContext

    tc = TaskContext.get()
    if tc is not None and tc.attemptNumber() == 0:
        raise RuntimeError(
            f"chaos[{tag}]: injected first-attempt task failure "
            f"(partition {tc.partitionId()})"
        )
