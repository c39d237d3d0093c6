"""Fused fill+backtrack kernel (align/graph_dp_pallas.py) vs host parity.

On CPU the kernel runs in interpret mode with a host-computed S (XLA:CPU's
LLVM-level FMA contraction breaks the exact-S replay; the TPU backend never
contracts — probed).  PROGRAPHMSA_TEST_TPU=1 compiles on the real chip in a
subprocess, including the device-S path.
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
from prographmsa_tpu.align.backtrack import backtrack
from prographmsa_tpu.align.merge import merge_graphs
from prographmsa_tpu.align.graph_dp_pallas import align_pair_device

OPTS = Options()
FACT = WagModelFactory()


def _host_align(g1, g2, model):
    sc = DynProgScores(g1, g2, model, OPTS)
    S = precompute_scores(g1, g2, model, sc, engine="numpy")
    dp = fill_dp(g1, g2, S, sc)
    return backtrack(g1, g2, dp, sc), sc


def _assert_same(g1, g2, model):
    aln, sc = _host_align(g1, g2, model)
    res = align_pair_device(g1, g2, model, sc, interpret=True)
    assert res is not None
    m1, m2, score, _ = res
    assert m1 == aln.mapping1
    assert m2 == aln.mapping2
    assert np.float32(score) == np.float32(aln.score)
    return aln


def _chain(seq):
    return sequence_graph(AA_SPEC, AA_SPEC.encode(seq))


def _merged(s1, s2, model, anc_of=None):
    g1, g2 = _chain(s1), _chain(s2)
    aln, _ = _host_align(g1, g2, model)
    anc = merge_graphs(g1, g2, aln.mapping1, aln.mapping2, model, model,
                       0.5, 0.5, OPTS)
    cg, _ = clean_graph(anc.graph, OPTS)
    return cg


def test_kernel_chains():
    m = FACT.get_model(0.3, OPTS)
    _assert_same(_chain("ACDEFGHIKLMNP"), _chain("ACDEFGIKLMNP"), m)


def test_kernel_merged_graphs():
    m = FACT.get_model(0.3, OPTS)
    cg = _merged("ACDEFGHIKLMNPQRSTVWY", "ACDEFGIKMNPQRSTVWY", m)
    g3 = _chain("ACDEFGHIKLMNPQRSTVW")
    _assert_same(cg, g3, m)
    _assert_same(g3, cg, m)


def test_kernel_merged_vs_merged():
    m = FACT.get_model(0.3, OPTS)
    cg = _merged("ACDEFGHIKLMNPQRSTVWY", "ACDEFGIKMNPQRSTVWY", m)
    g3 = _chain("ACDEFGHIKLMNPQRSTVW")
    aln, _ = _host_align(cg, g3, m)
    anc2 = merge_graphs(cg, g3, aln.mapping1, aln.mapping2, m, m, 0.5, 0.5,
                        OPTS)
    cg2, _ = clean_graph(anc2.graph, OPTS)
    _assert_same(cg2, cg, FACT.get_model(0.8, OPTS))


def test_kernel_random_pairs():
    rng = np.random.RandomState(5)
    AAs = "ACDEFGHIKLMNPQRSTVWY"
    m = FACT.get_model(0.6, OPTS)
    for _ in range(4):
        s1 = "".join(rng.choice(list(AAs), rng.randint(8, 80)))
        s2 = "".join(rng.choice(list(AAs), rng.randint(8, 80)))
        _assert_same(_chain(s1), _chain(s2), m)


def test_kernel_asymmetric_long_g2():
    """n2 >> n1 pairs (ADVICE r4 high): the traceback walks the y==0
    boundary past x = n1p (128 lanes), so the boundary-X stripe must be
    n2cap wide — the old n1p-wide stripe silently dropped X[0, x] values
    for x >= n1p and the chase's flat gather read the next sublane."""
    AAs = "ACDEFGHIKLMNPQRSTVWY"
    m = FACT.get_model(0.3, OPTS)
    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        s_long = "".join(rng.choice(list(AAs), 190))
        # a mutated/deleted variant -> merged g2 with multi-offset edges
        chars = list(s_long)
        for k in sorted(rng.choice(len(chars), 12, replace=False),
                        reverse=True):
            del chars[k]
        s_var = "".join(rng.choice(list(AAs)) if rng.rand() < 0.1 else c
                        for c in chars)
        cg2 = _merged(s_long, s_var, m)
        assert cg2.size > 128 + 2, "fixture must exceed one lane tile"
        g1 = _chain("".join(rng.choice(list(AAs), 13)))
        _assert_same(g1, cg2, m)


def test_kernel_repeat_edges_splice():
    # graphs with repeat edges fill correctly; a backtrack that takes a
    # repeat edge records the event and the harvest splices the host
    # markAlternativePath columns in — same mappings AND same
    # n_tr_indels as the host walk (round-5 replacement for the old
    # whole-pair bail)
    m = FACT.get_model(0.3, OPTS)
    g1 = _chain("ACDEFACDEFACDEF")
    tr = np.full(g1.size, -1, dtype=np.int64)
    tr[1:16] = np.tile(np.arange(5), 3)
    g1.add_repeats([tr])
    g2 = _chain("ACDEFACDEF")
    opts = Options(repeat_rate=0.5, repeatext_prob=0.3)
    sc = DynProgScores(g1, g2, m, opts)
    S = precompute_scores(g1, g2, m, sc, engine="numpy")
    dp = fill_dp(g1, g2, S, sc)
    aln = backtrack(g1, g2, dp, sc)
    res = align_pair_device(g1, g2, m, sc, interpret=True)
    assert res is not None
    assert list(res[0]) == aln.mapping1 and list(res[1]) == aln.mapping2
    assert res[3] == aln.n_tr_indels
    assert aln.n_tr_indels > 0, "fixture must actually take a repeat edge"


def test_kernel_repeat_fuzz():
    """Random repeat-annotated pairs through the batch path: mappings,
    scores AND n_tr_indels must equal the host walk (exercises the
    kind-split slot order, the event splice, and the single-pair tiers)."""
    from prographmsa_tpu.align.graph_dp_pallas import align_pairs_device

    aas = "ACDEFGHIKLMNPQRSTVWY"
    items, expected = [], []
    for seed in range(4):
        rng = np.random.RandomState(100 + seed)
        unit = "".join(rng.choice(list(aas), rng.randint(3, 6)))
        reps = rng.randint(2, 5)
        pre = "".join(rng.choice(list(aas), rng.randint(0, 8)))
        post = "".join(rng.choice(list(aas), rng.randint(0, 8)))
        s1 = pre + unit * reps + post
        g1 = _chain(s1)
        tr = np.full(g1.size, -1, dtype=np.int64)
        lo = len(pre) + 1
        tr[lo:lo + len(unit) * reps] = np.tile(np.arange(len(unit)), reps)
        g1.add_repeats([tr])
        s2 = pre + unit * max(1, reps - rng.randint(1, reps)) + post
        g2 = _chain(s2)
        opts = Options(repeat_rate=0.5, repeatext_prob=0.3)
        m = FACT.get_model(0.3 + 0.1 * seed, opts)
        sc = DynProgScores(g1, g2, m, opts)
        S = precompute_scores(g1, g2, m, sc, engine="numpy")
        aln = backtrack(g1, g2, fill_dp(g1, g2, S, sc), sc)
        items.append((g1, g2, m, sc))
        expected.append(aln)
    res = align_pairs_device(items, interpret=True)
    n_ok = 0
    for r, aln in zip(res, expected):
        assert r is not None
        assert list(r[0]) == aln.mapping1
        assert list(r[1]) == aln.mapping2
        assert r[3] == aln.n_tr_indels
        n_ok += aln.n_tr_indels
    assert n_ok > 0, "fuzz never exercised a repeat step"


@pytest.mark.skipif(os.environ.get("PROGRAPHMSA_TEST_TPU") != "1",
                    reason="set PROGRAPHMSA_TEST_TPU=1 to compile on TPU")
def test_kernel_on_real_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    code = (
        "from tests.test_graph_dp_pallas import (FACT, OPTS, _merged,"
        " _chain, _host_align, align_pair_device);"
        "m = FACT.get_model(0.3, OPTS);"
        "cg = _merged('ACDEFGHIKLMNPQRSTVWY', 'ACDEFGIKMNPQRSTVWY', m);"
        "g3 = _chain('ACDEFGHIKLMNPQRSTVW');"
        "aln, sc = _host_align(cg, g3, m);"
        "res = align_pair_device(cg, g3, m, sc, interpret=False,"
        " s_mode='device');"
        "assert res is not None;"
        "assert res[0] == aln.mapping1 and res[1] == aln.mapping2;"
        "import numpy as np;"
        "assert np.float32(res[2]) == np.float32(aln.score);"
        "print('TPU-OK')"
    )
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=900,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert "TPU-OK" in out.stdout, (out.stdout[-1000:], out.stderr[-2000:])


def test_kernel_batch_mixed_pairs():
    from prographmsa_tpu.align.graph_dp_pallas import (align_pairs_device,
                                                      fallback_stats)
    rng = np.random.RandomState(9)
    AAs = "ACDEFGHIKLMNPQRSTVWY"
    m = FACT.get_model(0.4, OPTS)
    cg = _merged("ACDEFGHIKLMNPQRSTVWY", "ACDEFGIKMNPQRSTVWY", m)
    items, expected = [], []
    for spec_pair in [
        (_chain("ACDEFGHIKLMNP"), _chain("ACDEFGIKLMNP")),
        (cg, _chain("ACDEFGHIKLMNPQRSTVW")),
        (_chain("".join(rng.choice(list(AAs), 40))),
         _chain("".join(rng.choice(list(AAs), 33)))),
    ]:
        g1, g2 = spec_pair
        aln, sc = _host_align(g1, g2, m)
        items.append((g1, g2, m, sc))
        expected.append(aln)
    before = fallback_stats()
    res = align_pairs_device(items, interpret=True)
    after = fallback_stats()
    assert all(r is not None for r in res)
    for r, aln in zip(res, expected):
        assert r[0] == aln.mapping1
        assert r[1] == aln.mapping2
        assert np.float32(r[2]) == np.float32(aln.score)
    # silent-fallback regression guard (VERDICT r3 #6): chain/merged pairs
    # of this shape must ALL stay on the device path, and the counters
    # must record exactly that
    assert after["pairs_device"] - before["pairs_device"] == len(items)
    for k, v in after.items():
        if k.startswith("fb_"):
            assert v == before.get(k, 0), "silent fallback: %s" % k


def test_kernel_many_offsets_tiers():
    # synthetic graphs with many distinct predecessor offsets exercise the
    # big-tier (op >= 8) fori M-loop, which compiles differently from the
    # unrolled small tiers
    from prographmsa_tpu.graph.graph import Graph

    rng = np.random.RandomState(17)
    AAs = "ACDEFGHIKLMNPQRSTVWY"
    m = FACT.get_model(0.5, OPTS)

    def heavy(n, offsets, seed):
        r = np.random.RandomState(seed)
        prof = np.zeros((n - 2, 20))
        prof[np.arange(n - 2), r.randint(0, 20, n - 2)] = 1.0
        g = sequence_graph(AA_SPEC,
                          AA_SPEC.encode("".join(r.choice(list(AAs), n - 2))))
        preds = [list(p) for p in g.preds]
        for i in range(2, n - 1):
            for o in offsets:
                if i - o >= 1 and r.rand() < 0.3:
                    preds[i].append((i - o, np.float32(0.25 * o)))
        for p in preds:
            p.sort(key=lambda t: t[0])
        return Graph(g.sites.copy(), preds, [list(x) for x in g.reps])

    # tier-2 shaped (6-8 offsets, reach < 62) and tier-3 shaped (12+)
    g1 = heavy(60, [2, 3, 5, 7, 11, 13, 17], 1)
    g2 = heavy(55, [2, 3, 4, 6, 9], 2)
    _assert_same(g1, g2, m)
    g3 = heavy(48, [2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 19, 23], 3)
    g4 = heavy(52, [2, 3, 5, 8, 13, 21, 34, 55], 4)
    _assert_same(g3, g4, m)
