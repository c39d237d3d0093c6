"""Floating-point-compatible reductions matching Eigen's SSE2 redux.

BioNJ tie-breaking (tree/nj.py) depends on the exact rounding of the
distance-matrix column sums: at dim=4 the Q-matrix minimum is an exact
mathematical tie between complementary pairs, and the winner is decided by
accumulated rounding noise.  The reference binary (Eigen ~3.1, SSE2) sums a
contiguous aligned column of doubles with two 2-wide packet accumulators:

    acc0 = v[0:2] + v[4:6] + v[8:10] + ...
    acc1 = v[2:4] + v[6:8] + ...
    acc0 += acc1; (+ trailing packet if n%4>=2); res = acc0[0]+acc0[1]
    then scalar remainder elements appended left-to-right
    (Eigen/src/Core/Redux.h, LinearVectorizedTraversal)

Columns of a heap-allocated col-major matrix start 16-byte aligned iff
(col * rows) is even; unaligned columns peel the first element into the
scalar epilogue.  ``eigen_colwise_sum`` reproduces all of this, making our
double-precision NJ bit-identical to the reference where the inputs are
(which holds for the prealigned-distance iterations).
"""

from __future__ import annotations

import numpy as np


def _redux_contiguous(v: np.ndarray, aligned_start: int) -> float:
    """Eigen vectorized sum of one contiguous double column."""
    n = v.size
    body = n - aligned_start
    packet = 2
    aligned_size = (body // packet) * packet
    aligned_size2 = (body // (2 * packet)) * (2 * packet)
    aligned_end = aligned_start + aligned_size
    aligned_end2 = aligned_start + aligned_size2

    if aligned_size > packet:
        acc0 = v[aligned_start:aligned_start + 2].copy()
        acc1 = v[aligned_start + 2:aligned_start + 4].copy()
        i = aligned_start + 4
        while i < aligned_end2:
            acc0 += v[i:i + 2]
            acc1 += v[i + 2:i + 4]
            i += 4
        acc0 += acc1
        if aligned_end > aligned_end2:
            acc0 += v[aligned_end2:aligned_end2 + 2]
        res = acc0[0] + acc0[1]
        for i in range(aligned_start):
            res = res + v[i]
        for i in range(aligned_end, n):
            res = res + v[i]
        return res
    res = v[0]
    for i in range(1, n):
        res = res + v[i]
    return res


def eigen_colwise_sum(M: np.ndarray) -> np.ndarray:
    """colwise().sum() of a col-major heap matrix, Eigen/SSE2 rounding."""
    rows, cols = M.shape
    out = np.empty(cols, dtype=np.float64)
    for j in range(cols):
        aligned_start = (j * rows) % 2
        out[j] = _redux_contiguous(np.ascontiguousarray(M[:, j]), aligned_start)
    return out


def eigen_seq_sum(v: np.ndarray) -> float:
    """Scalar left-to-right sum (Eigen DefaultTraversal, used for strided
    row expressions like ``(V.row(i2)-V.row(i1)).sum()``)."""
    res = v[0]
    for x in v[1:]:
        res = res + x
    return float(res)
