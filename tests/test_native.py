"""Native (C++) graphcore kernels vs the numpy reference implementations:
results must be bit-identical (same float32 op order, -ffp-contract=off;
see prographmsa_tpu/native/graphcore.cpp)."""

import numpy as np
import pytest

from prographmsa_tpu.config import Options
from prographmsa_tpu.alphabet import AA_SPEC
from prographmsa_tpu.graph.graph import sequence_graph, clean_graph
from prographmsa_tpu.models.factory import WagModelFactory
from prographmsa_tpu.align.scores import DynProgScores, precompute_scores
from prographmsa_tpu.align.dp import fill_dp
from prographmsa_tpu.align.merge import merge_graphs
from prographmsa_tpu.align.backtrack import backtrack
from prographmsa_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native graphcore unavailable")

AAS = "ACDEFGHIKLMNPQRSTVWY"


def _rand_seq(rng, n):
    return AA_SPEC.encode("".join(rng.choice(list(AAS), n)))


def _model(d=0.3):
    opts = Options()
    f = WagModelFactory()
    return f.get_model(d, opts), opts, f


def _check_pair(g1, g2, model, opts, with_repeats=False):
    scores = DynProgScores(g1, g2, model, opts)
    S = precompute_scores(g1, g2, model, scores)
    host = fill_dp(g1, g2, S, scores)
    nat = native.fill_dp_native(g1, g2, S, scores)
    for name in ("M", "X", "Y", "W"):
        h, d = getattr(host, name), getattr(nat, name)
        mism = ~((h == d) | (np.isneginf(h) & np.isneginf(d))
                 | (np.isnan(h) & np.isnan(d)))
        assert not mism.any(), (name, np.argwhere(mism)[:5])
    assert host.Wend == nat.Wend

    bt_host = backtrack(g1, g2, host, scores)
    bt_nat = native.backtrack_native(g1, g2, nat, scores)
    if with_repeats:
        assert bt_nat is None          # routed to the Python walk
    else:
        assert bt_nat is not None
        assert list(bt_nat.mapping1) == list(bt_host.mapping1)
        assert list(bt_nat.mapping2) == list(bt_host.mapping2)
        assert bt_nat.score == bt_host.score


def test_fill_and_backtrack_chains():
    rng = np.random.default_rng(3)
    model, opts, _ = _model()
    for _ in range(5):
        g1 = sequence_graph(AA_SPEC, _rand_seq(rng, int(rng.integers(5, 60))))
        g2 = sequence_graph(AA_SPEC, _rand_seq(rng, int(rng.integers(5, 60))))
        _check_pair(g1, g2, model, opts)


def test_fill_and_backtrack_merged_graphs():
    rng = np.random.default_rng(11)
    model, opts, _ = _model()
    for _ in range(4):
        s = _rand_seq(rng, 40)
        s2 = s.copy()
        # delete + substitute to force indels and skip edges in the merge
        s2 = np.delete(s2, slice(10, 16))
        g1 = sequence_graph(AA_SPEC, s)
        g2 = sequence_graph(AA_SPEC, s2)
        scores = DynProgScores(g1, g2, model, opts)
        S = precompute_scores(g1, g2, model, scores)
        dp = fill_dp(g1, g2, S, scores)
        aln = backtrack(g1, g2, dp, scores)
        anc = merge_graphs(g1, g2, aln.mapping1, aln.mapping2, model, model,
                           0.5, 0.5, opts)
        cg, _ = clean_graph(anc.graph, opts)
        g3 = sequence_graph(AA_SPEC, _rand_seq(rng, 35))
        _check_pair(cg, g3, model, opts)


def test_fill_with_repeat_edges_backtrack_routed_to_python():
    model, opts, _ = _model()
    seq = AA_SPEC.encode("ACDACDACDEFGHIKLM")
    g1 = sequence_graph(AA_SPEC, seq)
    tr = np.full(g1.size, -1, dtype=np.int64)
    tr[1:10] = [0, 1, 2, 0, 1, 2, 0, 1, 2]      # three ACD units
    g1.add_repeats([tr])
    g2 = sequence_graph(AA_SPEC, AA_SPEC.encode("ACDACDEFGHIKLM"))
    _check_pair(g1, g2, model, opts, with_repeats=True)


def test_nw_batch_matches_host():
    from prographmsa_tpu.distances.align import (_load_scoring, _seq_codes,
                                                 _batched_W, _reconstruct_XY,
                                                 _backtrack_pair, GAP_PARAMS)
    rng = np.random.default_rng(5)
    scoring = _load_scoring("aa")
    go, ge = GAP_PARAMS["aa"]
    seqs = [_rand_seq(rng, int(rng.integers(8, 70))) for _ in range(8)]
    codes = [_seq_codes(AA_SPEC, s) for s in seqs]
    pairs = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    L = max(len(c) for c in codes)
    B = len(pairs)
    s1b = np.zeros((B, L), np.int32)
    s2b = np.zeros((B, L), np.int32)
    l1 = np.zeros(B, np.int32)
    l2 = np.zeros(B, np.int32)
    for b, (i, j) in enumerate(pairs):
        s1b[b, :len(codes[i])] = codes[i]
        s2b[b, :len(codes[j])] = codes[j]
        l1[b], l2[b] = len(codes[i]), len(codes[j])

    counts, gaps = native.nw_counts_native(s1b, s2b, l1, l2, scoring, go, ge,
                                           20)
    W = _batched_W(s1b, l1, s2b, l2, scoring, go, ge)
    X, Y = _reconstruct_XY(W, go, ge)
    for b, (i, j) in enumerate(pairs):
        c_ref, g_ref = _backtrack_pair(
            W[b, :l2[b] + 1, :l1[b] + 1], X[b, :l2[b] + 1, :l1[b] + 1],
            Y[b, :l2[b] + 1, :l1[b] + 1], codes[i], codes[j], scoring, 20)
        assert np.array_equal(counts[b], c_ref), b
        assert gaps[b] == g_ref, b


def test_precompute_scores_native_bitwise():
    rng = np.random.default_rng(3)
    model, opts, _ = _model(0.47)
    for L1, L2 in ((13, 21), (64, 5), (130, 130)):
        g1 = sequence_graph(AA_SPEC, _rand_seq(rng, L1))
        g2 = sequence_graph(AA_SPEC, _rand_seq(rng, L2))
        scores = DynProgScores(g1, g2, model, opts)
        Sn = precompute_scores(g1, g2, model, scores, "native")
        Sp = precompute_scores(g1, g2, model, scores, "numpy")
        eq = ((Sn == Sp) | (np.isnan(Sn) & np.isnan(Sp))
              | (np.isneginf(Sn) & np.isneginf(Sp))
              | (np.isposinf(Sn) & np.isposinf(Sp)))
        assert eq.all(), np.argwhere(~eq)[:5]


def test_average_alignment_length_native_on_merged_graph():
    from prographmsa_tpu.align.scores import average_alignment_length
    rng = np.random.default_rng(5)
    model, opts, _ = _model()
    g1 = sequence_graph(AA_SPEC, _rand_seq(rng, 20))
    g2 = sequence_graph(AA_SPEC, _rand_seq(rng, 18))
    scores = DynProgScores(g1, g2, model, opts)
    S = precompute_scores(g1, g2, model, scores)
    dp = fill_dp(g1, g2, S, scores)
    aln = backtrack(g1, g2, dp, scores)
    anc = merge_graphs(g1, g2, aln.mapping1, aln.mapping2, model, model,
                       0.5, 0.5, opts)
    cg, _ = clean_graph(anc.graph, opts)
    for g in (g1, g2, anc.graph, cg):
        assert (average_alignment_length(g, "native")
                == average_alignment_length(g, "numpy"))


def test_clean_graph_native_parity():
    from prographmsa_tpu.graph.graph import clean_graph
    rng = np.random.default_rng(9)
    model, opts, _ = _model()
    g1 = sequence_graph(AA_SPEC, _rand_seq(rng, 30))
    g2 = sequence_graph(AA_SPEC, _rand_seq(rng, 26))
    scores = DynProgScores(g1, g2, model, opts)
    S = precompute_scores(g1, g2, model, scores)
    dp = fill_dp(g1, g2, S, scores)
    aln = backtrack(g1, g2, dp, scores)
    anc = merge_graphs(g1, g2, aln.mapping1, aln.mapping2, model, model,
                       0.5, 0.5, opts)
    # repeat edges too (incl. the units==1 NaN-traversal quirk)
    tr = np.full(anc.graph.size - 2, -1, dtype=np.int64)
    tr[4:8] = [0, 1, 0, 1]
    anc.graph.add_repeats([tr])

    for o in (opts, opts.replace(repeatext_prob=0.0)):
        cn, on = clean_graph(anc.graph, o.replace(engine="native"))
        cp, op = clean_graph(anc.graph, o.replace(engine="numpy"))
        assert np.array_equal(on, op)
        assert np.array_equal(cn.sites, cp.sites)
        assert cn.preds == cp.preds
        assert cn.reps == cp.reps


def test_merge_edges_native_parity():
    from prographmsa_tpu.graph.graph import clean_graph
    rng = np.random.default_rng(13)
    model, opts, _ = _model()
    g1 = sequence_graph(AA_SPEC, _rand_seq(rng, 24))
    g2 = sequence_graph(AA_SPEC, _rand_seq(rng, 22))
    # give g1 repeat edges so the carried-units path is exercised
    tr = np.full(g1.size - 2, -1, dtype=np.int64)
    tr[3:9] = [0, 1, 2, 0, 1, 2]
    g1.add_repeats([tr])
    scores = DynProgScores(g1, g2, model, opts)
    S = precompute_scores(g1, g2, model, scores)
    dp = fill_dp(g1, g2, S, scores)
    aln = backtrack(g1, g2, dp, scores)

    a_nat = merge_graphs(g1, g2, aln.mapping1, aln.mapping2, model, model,
                         0.5, 0.7, opts.replace(engine="native"))
    a_py = merge_graphs(g1, g2, aln.mapping1, aln.mapping2, model, model,
                        0.5, 0.7, opts.replace(engine="numpy"))
    assert np.array_equal(a_nat.graph.sites, a_py.graph.sites)
    assert a_nat.graph.preds == a_py.graph.preds
    assert a_nat.graph.reps == a_py.graph.reps
    assert a_nat.mapping1 == a_py.mapping1
    assert a_nat.mapping2 == a_py.mapping2
    assert a_nat.is_matched == a_py.is_matched
