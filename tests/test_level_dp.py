"""chain_dp_batch (batched leaf-level DP) vs the per-pair parity fill.

Closes the round-1 gap: the batched chain recurrence was only ever compared
against its own sharded form.  Here every lane of a batch is checked against
align/dp.fill_dp on the same pair — terminal scores must be bit-identical
(both paths are float32 fmax/add chains in the same order).
"""

import numpy as np

from prographmsa_tpu.config import Options
from prographmsa_tpu.alphabet import AA_SPEC
from prographmsa_tpu.graph.graph import sequence_graph
from prographmsa_tpu.models.factory import WagModelFactory
from prographmsa_tpu.align.scores import DynProgScores, precompute_scores
from prographmsa_tpu.align.dp import fill_dp
from prographmsa_tpu.parallel.level_dp import chain_dp_batch

AAS = "ACDEFGHIKLMNPQRSTVWY"


def _random_seq(rng, n):
    return "".join(AAS[i] for i in rng.integers(0, 20, size=n))


def test_chain_dp_batch_matches_fill_dp():
    rng = np.random.default_rng(7)
    opts = Options()
    model = WagModelFactory().get_model(0.3, opts)
    L1, L2, B = 17, 14, 6

    pairs = []
    for _ in range(B):
        g1 = sequence_graph(AA_SPEC, AA_SPEC.encode(_random_seq(rng, L1)))
        g2 = sequence_graph(AA_SPEC, AA_SPEC.encode(_random_seq(rng, L2)))
        pairs.append((g1, g2))

    # same chain lengths + same model => identical DynProgScores per pair
    scores = DynProgScores(pairs[0][0], pairs[0][1], model, opts)
    S = np.stack([precompute_scores(g1, g2, model, scores)
                  for g1, g2 in pairs]).astype(np.float32)
    params = {k: np.float32(getattr(scores, k))
              for k in ("gap_extend", "gap_init", "start_gap", "start_init",
                        "end_match", "end_gap", "end_skip")}
    wend_batch = np.asarray(chain_dp_batch(S, params))

    for b, (g1, g2) in enumerate(pairs):
        dp = fill_dp(g1, g2, S[b], scores)
        assert wend_batch[b] == dp.Wend, (b, wend_batch[b], dp.Wend)


def test_chain_dp_batch_rectangular_and_tiny():
    rng = np.random.default_rng(11)
    opts = Options()
    model = WagModelFactory().get_model(0.7, opts)
    for L1, L2 in ((3, 9), (9, 3), (2, 2), (25, 25)):
        g1 = sequence_graph(AA_SPEC, AA_SPEC.encode(_random_seq(rng, L1)))
        g2 = sequence_graph(AA_SPEC, AA_SPEC.encode(_random_seq(rng, L2)))
        scores = DynProgScores(g1, g2, model, opts)
        S = precompute_scores(g1, g2, model, scores)[None].astype(np.float32)
        params = {k: np.float32(getattr(scores, k))
                  for k in ("gap_extend", "gap_init", "start_gap",
                            "start_init", "end_match", "end_gap", "end_skip")}
        wend = np.asarray(chain_dp_batch(S, params))[0]
        dp = fill_dp(g1, g2, S[0], scores)
        assert wend == dp.Wend, (L1, L2, wend, dp.Wend)
