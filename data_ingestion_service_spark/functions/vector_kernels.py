"""NumPy fold kernels for ``mapInPandas`` vector operators.

Arrow-side counterparts of :mod:`functions.vector`'s interpreted HOF
folds (``aggregate(zip_with(...))`` lambdas never enter whole-stage
codegen — the per-row interpreted cost is the 100 TB bottleneck the
round-7 ``q_label_noise`` kernel first removed; these helpers make that
pattern reusable).

Bit-exactness contract: every helper replays the EXACT IEEE-754
operation sequence of the JVM fold it replaces — a left-to-right fold
implemented as ONE row-vectorized numpy op per dimension, so the adds
happen in the same order per row, just across the whole Arrow batch at
once. ``0.0 + e0 == e0`` (squares/products are never ``-0.0``-signed in
a way that changes the sum), so the seeded-zero accumulator is safe.

Rounding deliberately does NOT happen here: Spark's ``round`` is
BigDecimal HALF_UP while numpy rounds half-even, so kernels emit RAW
fold values and callers apply ``F.round`` JVM-side on the kernel
output. Identical raw doubles through the identical JVM round keep
every DuckDB oracle bit-exact with zero Python rounding hazard.
"""

from __future__ import annotations

import numpy as np

from ..chaos import maybe_fail


def stack(col) -> "np.ndarray":
    """pandas Series of equal-length list/array cells -> N x D float64."""
    # Every vector kernel funnels its Arrow batches through here, so this
    # is the one instrumentation point that puts ALL embedding folds under
    # the retry-determinism rung (chaos.py; no-op unless enabled).
    maybe_fail("vector_kernel")
    return np.vstack(col.to_numpy()).astype(np.float64, copy=False)


def fold_dot(mat: "np.ndarray", vec: "np.ndarray") -> "np.ndarray":
    """``aggregate(zip_with(a, b, x*y), 0.0, acc+x)`` per row: 64 rank-1
    multiply-then-add updates, left-to-right — NOT ``mat @ vec`` (BLAS
    reorders/pairs the adds and breaks bit-parity with the JVM fold)."""
    acc = np.zeros(mat.shape[0])
    for d in range(mat.shape[1]):
        acc += mat[:, d] * vec[d]
    return acc


def fold_sq_l2(mat: "np.ndarray", vec: "np.ndarray") -> "np.ndarray":
    """``aggregate(zip_with(a, c, (x-y)*(x-y)), 0.0, acc+x)`` per row."""
    acc = np.zeros(mat.shape[0])
    for d in range(mat.shape[1]):
        diff = mat[:, d] - vec[d]
        acc += diff * diff
    return acc


def fold_norm(mat: "np.ndarray") -> "np.ndarray":
    """``sqrt(aggregate(a, 0.0, acc + x*x))`` per row."""
    acc = np.zeros(mat.shape[0])
    for d in range(mat.shape[1]):
        acc += mat[:, d] * mat[:, d]
    return np.sqrt(acc)


def fold_sq_l2_int(mat: "np.ndarray", vec: "np.ndarray") -> "np.ndarray":
    """Exact int64 squared L2 (``q_embed_kmeans``'s BIGINT distance):
    integer arithmetic has no order hazard, so this one may use any
    order — kept dimension-major for symmetry. Range check: e6-quantized
    components are |x| <= ~2**21, so the 64-dim sum is < 2**47."""
    acc = np.zeros(mat.shape[0], dtype=np.int64)
    for d in range(mat.shape[1]):
        diff = mat[:, d] - vec[d]
        acc += diff * diff
    return acc


def lsh_bucket(mat: "np.ndarray", signs: "np.ndarray") -> "np.ndarray":
    """Sign-random-projection bucket id: bit p set iff the left-to-right
    fold of ``x * signs[p]`` is >= 0. ``signs`` is P x D of +/-1."""
    bucket = np.zeros(mat.shape[0], dtype=np.int64)
    for p in range(signs.shape[0]):
        bucket += np.where(fold_dot(mat, signs[p]) >= 0, 1 << p, 0)
    return bucket
