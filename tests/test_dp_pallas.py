"""Pallas wavefront DP fill vs host parity fill.

On CPU the kernel runs in interpret mode (pl.pallas_call(interpret=True)),
exercising the identical kernel program; set PROGRAPHMSA_TEST_TPU=1 to also
compile and run it on the real chip in a subprocess (JAX_PLATFORMS unset so
the axon TPU plugin is used).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from prographmsa_tpu.config import Options
from prographmsa_tpu.alphabet import AA_SPEC
from prographmsa_tpu.graph.graph import sequence_graph, clean_graph
from prographmsa_tpu.models.factory import WagModelFactory
from prographmsa_tpu.align.scores import DynProgScores, precompute_scores
from prographmsa_tpu.align.dp import fill_dp
from prographmsa_tpu.align.dp_pallas import fill_dp_pallas
from prographmsa_tpu.align.merge import merge_graphs
from prographmsa_tpu.align.backtrack import backtrack


def _pair(seq1, seq2):
    opts = Options()
    f = WagModelFactory()
    model = f.get_model(0.3, opts)
    g1 = sequence_graph(AA_SPEC, AA_SPEC.encode(seq1))
    g2 = sequence_graph(AA_SPEC, AA_SPEC.encode(seq2))
    return g1, g2, model, opts, f


def _compare(g1, g2, model, opts):
    scores = DynProgScores(g1, g2, model, opts)
    S = precompute_scores(g1, g2, model, scores)
    host = fill_dp(g1, g2, S, scores)
    dev = fill_dp_pallas(g1, g2, S, scores)
    assert dev is not None
    for name in ("M", "X", "Y", "W"):
        h = getattr(host, name)
        d = getattr(dev, name)
        mism = ~((h == d) | (np.isneginf(h) & np.isneginf(d)))
        assert not mism.any(), (name, np.argwhere(mism)[:5],
                                h[mism][:5], d[mism][:5])
    assert host.Wend == dev.Wend
    return host, dev, scores


def test_pallas_fill_linear_chains():
    g1, g2, model, opts, _ = _pair("ACDEFGHIKLMNP", "ACDEFGIKLMNP")
    _compare(g1, g2, model, opts)


def test_pallas_fill_merged_graph():
    # skip-edge predecessor structure (multiple offsets per node)
    g1, g2, model, opts, f = _pair("ACDEFGHIKLMNPQRSTVWY",
                                   "ACDEFGIKMNPQRSTVWY")
    scores = DynProgScores(g1, g2, model, opts)
    S = precompute_scores(g1, g2, model, scores)
    dp = fill_dp(g1, g2, S, scores)
    aln = backtrack(g1, g2, dp, scores)
    anc = merge_graphs(g1, g2, aln.mapping1, aln.mapping2, model, model,
                       0.5, 0.5, opts)
    g3 = sequence_graph(AA_SPEC, AA_SPEC.encode("ACDEFGHIKLMNPQRSTVW"))
    cg, _ = clean_graph(anc.graph, opts)
    _compare(cg, g3, model, opts)
    _compare(g3, cg, model, opts)


def test_pallas_backtrack_path_identical():
    # the filled matrices drive the standard backtrack to the same mappings
    g1, g2, model, opts, _ = _pair("MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ",
                                   "MKTAYIAKQRQISFVKHFSRQLEERLGLIEV")
    host, dev, scores = _compare(g1, g2, model, opts)
    a_h = backtrack(g1, g2, host, scores)
    a_d = backtrack(g1, g2, dev, scores)
    assert a_h.mapping1 == a_d.mapping1
    assert a_h.mapping2 == a_d.mapping2
    assert a_h.score == a_d.score


@pytest.mark.skipif(os.environ.get("PROGRAPHMSA_TEST_TPU") != "1",
                    reason="set PROGRAPHMSA_TEST_TPU=1 to compile on TPU")
@pytest.mark.xfail(reason="Mosaic kernel faults the v5e TPU worker "
                          "(2026-08-19); interpret-mode parity passes — "
                          "the compiled kernel is gated behind the "
                          "explicit 'pallas' engine until fixed",
                   run=True, strict=False)
def test_pallas_fill_on_real_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    code = (
        "from tests.test_dp_pallas import _pair, _compare;"
        "g1, g2, model, opts, _ = _pair('ACDEFGHIKLMNP', 'ACDEFGIKLMNP');"
        "_compare(g1, g2, model, opts); print('TPU-OK')"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=600,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "TPU-OK" in out.stdout, out.stderr[-2000:]
