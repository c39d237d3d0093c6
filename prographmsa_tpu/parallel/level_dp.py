"""Batched graph-pair DP for one tree level (linear-chain graphs).

At the leaf level of the guide tree every graph is a linear chain
(SequenceGraph.h:101-121: free i->i+1 edges only), so the general
predecessor iteration of GraphAlign.h:238-260 collapses to the classic
pair-HMM recurrence with fixed offsets (y-1, x-1).  That makes a whole tree
level one batched wavefront scan [B, H] — the unit that
``parallel.sharded.sharded_level_dp`` shards across the mesh.

Scores are float32 like the reference's dp_score_t; candidate op order
matches align/dp.py (fmax of (X-ext, W-init) then subtract edge cost — here
edge costs are 0 for chain edges).  Boundary rows use start_gap/start_init
(GraphAlign.h:214-234).
"""

from __future__ import annotations


import numpy as np

NEG = np.float32(-np.inf)


def chain_dp_batch(S, params):
    """Fill the M/X/Y/W recurrence for B chain-graph pairs at once.

    S: [B, n1, n2] float32 match-score matrices (row/col 0 and n-1 are the
    zero start/end sentinels, so interior cells are 1..n-2).
    params: dict of f32 scalars (gap_extend, gap_init, start_gap,
    start_init, end_match, end_gap, end_skip).
    Returns Wend [B] f32 — the terminal alignment scores
    (GraphAlign.h:262-280 specialized to single predecessors).
    """
    import jax
    import jax.numpy as jnp

    B, n1, n2 = S.shape
    D = n1 + n2
    H = n1
    ys = jnp.arange(H)
    ge, gi, sg, si = (params["gap_extend"], params["gap_init"],
                      params["start_gap"], params["start_init"])

    # shear S into diagonal-major [D, B, H] without gathers (pad+reshape)
    Sp = jnp.pad(S, ((0, 0), (0, 0), (0, H)), constant_values=NEG)
    flat = Sp.reshape(B, H * (n2 + H))
    sk = flat[:, :H * (n2 + H - 1)].reshape(B, H, n2 + H - 1)
    sd = jnp.transpose(sk[:, :, 1:D - 1], (2, 0, 1))      # diag d=1..D-2

    def step(carry, inp):
        d, Sdg = inp
        Wm1, Wm2, Xm1, Ym1 = carry
        xs = d - ys

        Wm1_up = jnp.roll(Wm1, 1, axis=1)
        Wm2_up = jnp.roll(Wm2, 1, axis=1)
        Ym1_up = jnp.roll(Ym1, 1, axis=1)

        newX = jnp.fmax(Xm1 + ge, Wm1 + gi)
        newXB = jnp.fmax(Xm1 + ge, Wm1 + sg)
        newY = jnp.fmax(Ym1_up + ge, Wm1_up + gi)
        newYB = jnp.fmax(Ym1_up + ge, Wm1_up + sg)
        newM = Wm2_up + Sdg

        interior = ((ys >= 1) & (ys <= n1 - 2) & (xs >= 1)
                    & (xs <= n2 - 2))[None, :]
        b_x0 = ((xs == 0) & (ys >= 1) & (ys <= n1 - 2))[None, :]
        b_y0 = ((ys == 0) & (xs >= 1) & (xs <= n2 - 2))[None, :]

        Mrow = jnp.where(interior, newM, NEG)
        Xrow = jnp.where(interior, newX, jnp.where(b_y0, newXB, NEG))
        Yrow = jnp.where(interior, newY, jnp.where(b_x0, newYB, NEG))
        Wrow = jnp.where(interior, jnp.fmax(Mrow, jnp.fmax(Xrow, Yrow)),
                         jnp.where(b_x0, newYB, jnp.where(b_y0, newXB, NEG)))
        return (Wrow, Wm1, Xrow, Yrow), (Mrow, Xrow, Yrow)

    W0 = jnp.full((B, H), NEG).at[:, 0].set(si)
    init = (W0, jnp.full((B, H), NEG), jnp.full((B, H), NEG),
            jnp.full((B, H), NEG))
    ds = jnp.arange(1, D - 1)
    _, (Mdg, Xdg, Ydg) = jax.lax.scan(step, init, (ds, sd))

    # end state (single predecessors: yp=n1-2, xp=n2-2, costs 0):
    # Wend = max(M+end_match, X+end_gap, Y+end_gap) at (n1-2, n2-2)
    d_end = n1 + n2 - 4                      # diag of (n1-2, n2-2)
    row = n1 - 2
    m = Mdg[d_end - 1, :, row]
    x = Xdg[d_end - 1, :, row]
    y = Ydg[d_end - 1, :, row]
    em, eg = params["end_match"], params["end_gap"]
    return jnp.fmax(m + em, jnp.fmax(x + eg, y + eg))

