"""Batched ML Newton (compute_distances_batch) must be bit-identical per
lane to the scalar compute_distance loop it replaces
(/root/reference/src/DistanceFactoryML.h:67-190)."""

import numpy as np
import pytest

from prographmsa_tpu.config import Options
from prographmsa_tpu.models.factory import WagModelFactory
from prographmsa_tpu.distances.ml import (compute_distance,
                                          compute_distances_batch)


def _random_counts(rng, n):
    """Count matrices spanning the edge cases: empty, identical-only,
    diagonal-heavy (small p-distance), near-random (saturated), sparse."""
    out = []
    for k in range(n):
        kind = k % 5
        c = np.zeros((20, 20), dtype=np.int64)
        if kind == 0:
            pass                                        # total == 0
        elif kind == 1:
            np.fill_diagonal(c, rng.integers(1, 50, 20))  # ident == total
        elif kind == 2:
            c = rng.poisson(0.2, (20, 20)).astype(np.int64)
            np.fill_diagonal(c, rng.integers(20, 60, 20))
        elif kind == 3:
            c = rng.poisson(3.0, (20, 20)).astype(np.int64)  # dist0 > 0.85
        else:
            c[rng.integers(0, 20), rng.integers(0, 20)] = 1
            c[3, 3] = rng.integers(0, 3)
        out.append(c)
    return np.array(out)


@pytest.mark.parametrize("mode", ["mldist", "mldist_gap", "pdist"])
def test_batch_matches_scalar_bitwise(mode):
    rng = np.random.default_rng(7)
    options = Options(mldist_flag=(mode == "mldist"),
                      mldist_gap_flag=(mode == "mldist_gap"))
    factory = WagModelFactory()
    counts = _random_counts(rng, 40)
    gaps = rng.integers(0, 10, 40).astype(np.int64)
    seqlens = rng.integers(50, 400, 40) / 2.0

    db, vb = compute_distances_batch(counts, gaps, seqlens, factory, options,
                                     "aa")
    for k in range(len(counts)):
        dv = compute_distance(counts[k], int(gaps[k]), float(seqlens[k]),
                              factory, options, "aa")
        assert db[k] == dv.dist, (k, db[k], dv.dist)
        assert vb[k] == dv.var, (k, vb[k], dv.var)


def test_batched_P_matches_scalar():
    from prographmsa_tpu.distances.ml import _batched_P
    factory = WagModelFactory()
    ds = np.array([0.05, 0.3, 1.0, 2.2, 5.2])
    Pb = _batched_P(factory, ds)
    for k, d in enumerate(ds):
        assert np.array_equal(Pb[k], factory.P_of(float(d)))
