"""Device DP fill vs host parity fill: identical matrices on real graphs
(the candidate arithmetic is pure float32 adds/maxes on both paths; only S
is shared from the host)."""

import numpy as np
import pytest

from prographmsa_tpu.config import Options
from prographmsa_tpu.alphabet import AA_SPEC
from prographmsa_tpu.graph.graph import sequence_graph, clean_graph
from prographmsa_tpu.models.factory import WagModelFactory
from prographmsa_tpu.align.scores import DynProgScores, precompute_scores
from prographmsa_tpu.align.dp import fill_dp
from prographmsa_tpu.align.dp_jax import fill_dp_device
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
    dev = fill_dp_device(g1, g2, S, scores)
    assert dev is not None
    for name in ("M", "X", "Y", "W"):
        h = getattr(host, name)
        d = getattr(dev, name)
        mism = ~((h == d) | (np.isneginf(h) & np.isneginf(d)))
        assert not mism.any(), (name, np.argwhere(mism)[:5],
                                h[mism][:5], d[mism][:5])
    assert host.Wend == dev.Wend
    return host, dev, scores


def test_device_fill_linear_chains():
    g1, g2, model, opts, _ = _pair("ACDEFGHIKLMNP", "ACDEFGIKLMNP")
    _compare(g1, g2, model, opts)


def test_device_fill_merged_graph():
    # build a merged (skip-edge) graph first, then align against a chain
    g1, g2, model, opts, f = _pair("ACDEFGHIKLMNPQRSTVWY", "ACDEFGIKMNPQRSTVWY")
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


def test_device_fill_unknown_residues():
    g1, g2, model, opts, _ = _pair("ACXEFGHIK", "ACDEXGHIK")
    _compare(g1, g2, model, opts)
