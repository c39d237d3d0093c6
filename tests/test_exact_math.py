"""Property tests for the correctly-rounded f32 division used by the
device-exact S pipeline (align/exact_math.py).

The host mirror shares the candidate-selection logic with the jnp
implementation; the hardware seed quotient is emulated by perturbing the
correct quotient by up to +/-3 ulp (the TPU divide was probed at <2 ulp).
"""

import numpy as np

from prographmsa_tpu.align.exact_math import exact_div_host


def _truth(x, y):
    with np.errstate(divide="ignore", invalid="ignore"):
        return (x / y).astype(np.float32)


def _check(x, y, off):
    truth = _truth(x, y)
    got = exact_div_host(x, y, off)
    same = (truth.view(np.uint32) == got.view(np.uint32)) | (
        np.isnan(truth) & np.isnan(got))
    assert same.all(), (x[~same][:5], y[~same][:5], truth[~same][:5],
                        got[~same][:5])


def test_exact_div_broad_range():
    rng = np.random.RandomState(7)
    n = 400_000
    x = (np.float32(2) ** rng.uniform(-60, 60, n).astype(np.float32)
         ).astype(np.float32)
    y = (np.float32(2) ** rng.uniform(-60, 60, n).astype(np.float32)
         ).astype(np.float32)
    x[::1000] = 0
    y[::997] = 0
    for r in (0, 1, 3):
        off = (None if r == 0 else
               rng.randint(-r, r + 1, size=n).astype(np.int64))
        _check(x, y, off)


def test_exact_div_near_midpoints():
    # quotients constructed just next to rounding boundaries (exact ties
    # are impossible for f32/f32 division)
    rng = np.random.RandomState(11)
    n = 200_000
    m = rng.randint(1 << 23, 1 << 24, size=n).astype(np.uint64)
    y = (((np.uint32(127) << np.uint32(23))
          | (m.astype(np.uint32) & np.uint32(0x7FFFFF))).view(np.float32))
    qm = rng.randint(1 << 23, 1 << 24, size=n).astype(np.uint64) * 2 + 1
    x = (qm.astype(np.float64) * y.astype(np.float64) * 2.0 ** -24
         ).astype(np.float32)
    off = rng.randint(-2, 3, size=n).astype(np.int64)
    _check(x, y, off)


def test_exact_div_s_pipeline_magnitudes():
    # num/den magnitudes as in precompute_scores: products of probabilities
    rng = np.random.RandomState(13)
    n = 200_000
    x = (rng.rand(n).astype(np.float32)
         * rng.choice([1e-30, 1e-10, 1e-3, 1.0], n).astype(np.float32))
    y = (rng.rand(n).astype(np.float32)
         * rng.choice([1e-30, 1e-10, 1e-3, 1.0], n).astype(np.float32))
    off = rng.randint(-3, 4, size=n).astype(np.int64)
    _check(x, y, off)
