"""ML pairwise distance estimation.

Re-derivation of /root/reference/src/DistanceFactoryML.{h,cpp}: initial
p-distance -> Jukes-Cantor-style transform -> Newton-Raphson with bisection
fallback maximizing sum(counts * log P(d)), variance from Fisher information.

Parity notes (reproduced intentionally):
* P(d) inside the Newton iteration is evaluated at the distance *clamped* by
  parseDistance (min_dist/max_dist) while the Newton iterate itself is
  unclamped (DistanceFactoryML.h:91 calling ModelFactory::getModel).
* Count matrices only include residue values < 20 regardless of alphabet
  (DistanceFactoryPrealigned.h:65) — for codon models this discards most
  pairs; for DNA we use the correct < DIM bound since the reference's DNA
  mode is unusable (it crashes; see tools/make_golden.sh).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

MAXITER = 20
EPSILON = 1e-5

DIST_MAX = {"aa": 2.2, "dna": 2.2, "codon": 5.2}
VAR_MAX = {"aa": 1e3, "dna": 1e3, "codon": 5e3}
VAR_MIN = {"aa": 1e-5, "dna": 1e-5, "codon": 1e-5}


@dataclass
class DistVar:
    dist: float
    var: float


def compute_ml_dist(counts: np.ndarray, gaps: int, seqlen: float,
                    dist0: float, var0: float, factory, options,
                    alphabet_name: str) -> DistVar:
    """Newton/bisection ML distance (DistanceFactoryML.h:67-136)."""
    dist_min = 0.0
    dist_max = np.inf
    dist, var = dist0, var0
    delta = 1.0
    iteration = 0
    c = counts.astype(np.float64)

    while abs(delta) > EPSILON:
        if iteration > MAXITER:
            if dist_max == np.inf:
                dist = DIST_MAX[alphabet_name]
                var = VAR_MAX[alphabet_name]
            else:
                dist = dist0
                var = var0
            break
        model = factory.get_model(dist, options)
        p = model.P
        pp = model.Q @ p
        ppp = model.Q @ pp

        if options.mldist_gap_flag:
            grate = options.indel_rate * seqlen * dist
            g = (-grate + gaps) / dist
            gg = -gaps / (dist * dist)
            f = (c * pp / p).sum() + g
            ff = ((c * (ppp * p - pp * pp)) / (p * p)).sum() + gg
        else:
            f = (c * pp / p).sum()
            ff = ((c * (ppp * p - pp * pp)) / (p * p)).sum()

        var = -1.0 / ff

        if f > 0:
            dist_min = max(dist_min, dist)
        else:
            dist_max = min(dist_max, dist)

        new_dist = dist - f / ff
        if not (new_dist < dist_max and new_dist > dist_min):
            upper = dist * 3 if dist_max == np.inf else dist_max
            new_dist = (upper + dist_min) / 2.0
        delta = 1.0 - new_dist / dist
        dist = new_dist
        iteration += 1

    return DistVar(dist, var)


def compute_distance(counts: np.ndarray, gaps: int, seqlen: float,
                     factory, options, alphabet_name: str) -> DistVar:
    """DistanceFactoryML::computeDistance (DistanceFactoryML.h:139-190)."""
    ident = float(np.trace(counts))
    total = float(counts.sum())
    dist0 = 1.0 - ident / total if total else np.nan

    dmax = DIST_MAX[alphabet_name]
    vmax = VAR_MAX[alphabet_name]
    vmin = VAR_MIN[alphabet_name]

    if options.mldist_flag or options.mldist_gap_flag:
        if total == 0 or dist0 > 0.85:
            dist = dist0 = dmax
            var = vmax
        else:
            dist = dist0 = -np.log(1.0 - dist0 - 0.2 * dist0 * dist0)
            var = dist / total
        if total > 0 and ident != total:
            dv = compute_ml_dist(counts, gaps, seqlen, dist, var, factory,
                                 options, alphabet_name)
            dist, var = dv.dist, dv.var
    else:
        if total == 0:
            dist = dist0 = 1.0
            var = vmax
        else:
            dist = dist0
            var = dist0 / total

    if not (dist < dmax):
        dist = dmax
        var = vmax
    if dist > options.cutoff_dist:
        dist = options.cutoff_dist
    if var < vmin:
        var = vmin
    if not (var < vmax):
        var = vmax
    return DistVar(dist, var)
