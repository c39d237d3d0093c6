import math

import numpy as np
import pytest

from prographmsa_tpu.config import Options
from prographmsa_tpu.models.factory import (
    WagModelFactory, DarwinModelFactory, EcmModelFactory, PlusFModelFactory,
    CustomModelFactory, parse_distance)


@pytest.fixture(scope="module")
def wag():
    return WagModelFactory()


def test_wag_q_properties(wag):
    # rows sum to ~0; rate normalized to 1 expected subst/unit
    assert np.abs(wag.Q.sum(axis=1)).max() < 1e-10
    assert abs(-(wag.freqs @ np.diag(wag.Q)) - 1.0) < 1e-10
    assert abs(wag.freqs.sum() - 1.0) < 1e-12
    assert (wag.freqs > 0).all()


def test_p_is_stochastic(wag):
    P = wag.P_of(0.7)
    assert np.abs(P.sum(axis=1) - 1.0).max() < 1e-8
    assert P.min() > -1e-10
    # expm parity vs scipy-style series via numpy (matrix power scaling)
    from numpy.linalg import matrix_power
    n = 1 << 20
    approx = matrix_power(np.eye(20) + wag.Q * (0.7 / n), n)
    assert np.abs(P - approx).max() < 1e-4


def test_p_zero_is_identity(wag):
    assert np.abs(wag.P_of(0.0) - np.eye(20)).max() < 1e-8


def test_reference_parity_uniform_freqs(wag):
    # Parity quirk: the reference maps its row-major WAG data through a
    # column-major Eigen::Map, so the binary runs with the transposed matrix
    # and uniform stationary frequencies (see EmpiricalModelFactory doc).
    assert np.abs(wag.freqs - 0.05).max() < 1e-9
    # The *transpose* of the loaded matrix is the true (reversible) WAG:
    raw = np.load("prographmsa_tpu/models/data/wag.npz")["Q"].T
    s, V = np.linalg.eig(raw.T)
    freqs = np.real(V[:, int(np.argmax(np.real(s)))])
    freqs = freqs / freqs.sum()
    assert abs(freqs[0] - 0.0866) < 1e-3  # published WAG pi_A


def test_parse_distance_pdist_mode():
    opt = Options()
    d, div = parse_distance(0.3, opt)
    assert abs(d - (-math.log(1.0 - 0.3 - 0.2 * 0.09))) < 1e-12
    assert div == 0.3
    # cap beyond 0.85
    d, _ = parse_distance(0.9, opt)
    assert d == opt.max_dist  # 5.2 clamped to max_dist=2.2


def test_parse_distance_mldist_mode():
    opt = Options(mldist_flag=True)
    d, div = parse_distance(1.0, opt)
    assert d == 1.0
    ed = math.exp(1.0)
    expected = -0.5 * (5 * ed - math.sqrt(45 * ed * ed - 20 * ed)) / ed
    assert abs(div - expected) < 1e-12


def test_get_model(wag):
    opt = Options()
    m = wag.get_model(0.3, opt)
    assert abs(m.epsilon - opt.gapext_prob) < 1e-12
    assert abs(m.delta - (1 - math.exp(-m.distance * opt.indel_rate)) / 2) < 1e-12
    assert np.abs(m.M - wag.freqs[:, None] * m.P).max() == 0


def test_darwin_overrides():
    opt = Options(darwin_flag=True)
    dar = DarwinModelFactory()
    m = dar.get_model(0.5, opt)
    assert abs(m.epsilon - 0.72508680168437312) < 1e-15
    assert abs(m.delta - min(0.5, 0.0052820194976999644 * m.distance ** 0.7434)) < 1e-15


def test_ecm_loads():
    ecm = EcmModelFactory()
    assert ecm.Q.shape == (61, 61)
    assert np.abs(ecm.Q.sum(axis=1)).max() < 1e-9


def test_plus_f(wag):
    opt = Options(aafreqs_flag=True)
    pf = PlusFModelFactory(WagModelFactory(), opt)
    vals = [np.array([0, 0, 0, 1, 2]), np.array([0, 5, 20, -1])]
    pf.estimate_freqs(vals, opt)
    # pseudocount dominates but freq of residue 0 should increase
    assert pf.freqs[0] > wag.freqs[0]
    assert abs(pf.freqs.sum() - 1.0) < 1e-12
    assert np.abs(pf.Q.sum(axis=1)).max() < 1e-10


def test_custom_model_roundtrip():
    # synthetic 4-state GTR: lower-triangular exchangeabilities + freqs
    rng = np.random.RandomState(0)
    dim = 4
    S = rng.uniform(0.5, 2.0, size=(dim, dim))
    S = (S + S.T) / 2
    freqs = rng.uniform(0.1, 0.4, size=dim)
    lines = []
    for i in range(1, dim):
        lines.append(" ".join("%.17g" % S[i, j] for j in range(i)))
    lines.append(" ".join("%.17g" % f for f in freqs))
    cm = CustomModelFactory("\n".join(lines), dim)
    freqs_n = freqs / freqs.sum()
    assert np.abs(cm.freqs - freqs_n).max() < 1e-12
    # off-diagonals proportional to S (note: reference does NOT multiply by
    # freqs — exchangeabilities are used as rates directly)
    ratio = cm.Q[0, 1] / S[0, 1]
    off = ~np.eye(dim, dtype=bool)
    assert np.abs(cm.Q[off] / S[off] - ratio).max() < 1e-10
    assert np.abs(cm.Q.sum(axis=1)).max() < 1e-12
    # rate normalization
    assert abs(-(cm.freqs @ np.diag(cm.Q)) - 1.0) < 1e-12
