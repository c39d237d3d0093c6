"""Pallas exact-S kernels (align/scores_pallas.py) vs the host S.

The kernels only run for real on a TPU backend (interpret mode routes the
replay through XLA:CPU, whose FMA contraction breaks the rounding replay),
so the bitwise assertion is gated behind PROGRAPHMSA_TEST_TPU=1 and runs in
a subprocess with the axon backend.  The layout/packing helpers are
covered unconditionally.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from prographmsa_tpu.align.scores_pallas import _pad8


def test_pad8():
    assert _pad8(20) == 24
    assert _pad8(4) == 8
    assert _pad8(61) == 64
    assert _pad8(64) == 64


TPU_CODE = r"""
import numpy as np
from prographmsa_tpu.config import Options
from prographmsa_tpu.alphabet import AA_SPEC
from prographmsa_tpu.graph.graph import sequence_graph
from prographmsa_tpu.models.factory import WagModelFactory
from prographmsa_tpu.align.scores import DynProgScores, precompute_scores
from prographmsa_tpu.align.scores_pallas import exact_s_batch_pallas

OPTS = Options(); FACT = WagModelFactory()
rng = np.random.default_rng(7)
aas = list("ACDEFGHIKLMNPQRSTVWY")
m = FACT.get_model(0.4, OPTS)
pairs = []
for k in range(4):
    s1 = "".join(rng.choice(aas) for _ in range(100 + 13 * k))
    s2 = "".join(rng.choice(aas) for _ in range(90 + 17 * k))
    pairs.append((sequence_graph(AA_SPEC, AA_SPEC.encode(s1)),
                  sequence_graph(AA_SPEC, AA_SPEC.encode(s2))))
n1p = n2cap = 256
B = len(pairs)
g1s = np.zeros((B, n1p, 20), np.float32)
g2s = np.zeros((B, n2cap, 20), np.float32)
Mb = np.zeros((B, 20, 20), np.float32)
pib = np.zeros((B, 20), np.float32)
mib = np.zeros(B, np.float32)
n1b = np.zeros(B, np.int32)
n2b = np.zeros(B, np.int32)
scs = []
for b, (g1, g2) in enumerate(pairs):
    sc = DynProgScores(g1, g2, m, OPTS)
    scs.append(sc)
    g1s[b, :g1.size] = g1.sites.astype(np.float32)
    g2s[b, :g2.size] = g2.sites.astype(np.float32)
    Mb[b] = m.M.astype(np.float32)
    pib[b] = m.pi.astype(np.float32)
    mib[b] = np.float32(sc.match_init)
    n1b[b], n2b[b] = g1.size, g2.size
S = np.asarray(exact_s_batch_pallas(g1s, g2s, Mb, pib, mib, n1b, n2b))
for b, (g1, g2) in enumerate(pairs):
    Sh = precompute_scores(g1, g2, m, scs[b], engine="numpy")
    Sh = Sh.astype(np.float32)
    Sp = S[b, :g1.size, :g2.size]
    assert np.array_equal(Sh.view(np.uint32), Sp.view(np.uint32)), b
print("TPU-S-OK")
"""


@pytest.mark.skipif(os.environ.get("PROGRAPHMSA_TEST_TPU") != "1",
                    reason="set PROGRAPHMSA_TEST_TPU=1 to compile on TPU")
def test_pallas_s_on_real_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    out = subprocess.run([sys.executable, "-c", TPU_CODE], env=env,
                         capture_output=True, text=True, timeout=900,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "TPU-S-OK" in out.stdout, (out.stdout[-1000:],
                                      out.stderr[-2000:])
