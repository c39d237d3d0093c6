"""NNLS unit tests vs scipy (same optimum) + WLS quirk coverage."""

import numpy as np

from prographmsa_tpu.tree.nnls import nnls


def test_nnls_matches_scipy_optimum():
    from scipy.optimize import nnls as scipy_nnls
    rng = np.random.default_rng(5)
    for _ in range(20):
        m, n = rng.integers(4, 12), rng.integers(2, 8)
        Z = rng.normal(size=(m, n))
        x = rng.normal(size=m)
        d = nnls(Z, x)
        d_ref, _ = scipy_nnls(Z, x)
        # same objective value (solutions may differ on degenerate faces)
        assert np.square(Z @ d - x).sum() <= np.square(Z @ d_ref - x).sum() \
            + 1e-8
        assert (d >= 0).all() or np.square(Z @ d - x).sum() <= \
            np.square(Z @ np.clip(d, 0, None) - x).sum() + 1e-8


def test_nnls_unconstrained_fast_path():
    """When the LS solution is already nonnegative it is returned as-is
    (NNLS.h:19-22) — may differ from the constrained-active-set answer."""
    Z = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    x = np.array([1.0, 2.0, 3.0])
    d = nnls(Z, x)
    ref = np.linalg.lstsq(Z, x, rcond=None)[0]
    assert np.allclose(d, ref)
