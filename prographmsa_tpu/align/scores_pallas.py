"""One-pass Pallas exact-S kernel (VERDICT r4 #2: the prologue cost).

The XLA exact-S replay (align/scores_device.py) pins every rank-1 update
with an optimization barrier, which blocks fusion: the S plane crosses HBM
~25 times per pair and the prologue ends up costing 3-5x the DP fill it
feeds.  This module computes the SAME bit-exact pipeline — Eigen gebp
rank-1 accumulation, SSE packet dots, correctly-rounded division, ls_log
with the column-major body/tail split (/root/reference/src/GraphAlign.h:146-163,
ls_log.h:7-59) — inside two Pallas kernels that keep every intermediate in
VMEM and write S to HBM exactly once:

  * kernel A (per pair): t2 = (M^T g2)^T by rank-1 steps, and the packet
    dot v2 = g2 . pi, both resident in VMEM.
  * kernel B (per pair x 8-row tile): num accumulation over dim, packet
    v1, den = v1*v2, exact_div, ls_log body/tail select — ~70 VPU ops per
    element, one output write.

Bit-exactness relies on two probed Mosaic facts: f32 mul/add round like
the host, and Mosaic never FMA-contracts (the XLA path needs barriers only
because XLA:CPU contracts; Mosaic has no such pass).  Asserted on-chip by
tests/test_scores_pallas.py::test_pallas_s_on_real_tpu.

Only used on real TPU backends (interpret mode would run the ops through
XLA:CPU, whose FMA contraction breaks the replay — the host S path covers
that case, as before).
"""

from __future__ import annotations

import functools

import numpy as np

from .scores import _LS_A, _LS_B, _LS_C


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


@functools.lru_cache(maxsize=32)
def _make_s_kernels(dim: int, n1p: int, n2cap: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .exact_math import exact_div_fn

    exact_div = exact_div_fn(barrier=False)
    f32 = jnp.float32
    i32 = jnp.int32
    u32 = jnp.uint32
    dimp = _pad8(dim)
    k4 = dim & ~3
    T = n1p // 8

    # ---- kernel A: per-pair g2-side prep (t2 and replicated v2) ----
    def kern_a(g2sT_ref, MT_ref, pi_ref, t2_ref, v2_ref):
        g2 = g2sT_ref[0]                     # (dimp, n2cap)
        acc = jnp.zeros((dimp, n2cap), f32)
        for b in range(dim):
            # host: t2 += fmul(g2s[:, b] outer M[b]) — same product, same
            # rounding (mul commutes); MT[d, b] = M[b, d]
            acc = acc + MT_ref[0][:, b:b + 1] * g2[b:b + 1, :]
        t2_ref[0] = acc
        # packet dot v2 = g2 . pi (4-lane accumulators + predux + tail)
        a4 = [jnp.zeros((1, n2cap), f32) for _ in range(4)]
        for k in range(0, k4, 4):
            for l in range(4):
                a4[l] = a4[l] + g2[k + l:k + l + 1, :] * pi_ref[0, 0, k + l]
        res = (a4[0] + a4[2]) + (a4[1] + a4[3])
        for k in range(k4, dim):
            res = res + g2[k:k + 1, :] * pi_ref[0, 0, k]
        v2_ref[0] = jnp.broadcast_to(res, (8, n2cap))

    @functools.lru_cache(maxsize=8)
    def make_call_a(B):
        return pl.pallas_call(
            kern_a,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, dimp, n2cap), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, dimp, 128), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, dimp, n2cap), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 8, n2cap), lambda b: (b, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, dimp, n2cap), jnp.float32),
                jax.ShapeDtypeStruct((B, 8, n2cap), jnp.float32),
            ],
            interpret=interpret,
        )

    # ---- kernel B: per (pair, row-tile) S tile ----
    def kern_b(scal_ref, g1s_ref, t2_ref, v2_ref, pi_ref, s_ref):
        b = pl.program_id(0)
        t = pl.program_id(1)
        n1 = scal_ref[b, 0]
        g1t = g1s_ref[0]                     # (8, dimp)
        t2 = t2_ref[0]                       # (dimp, n2cap)
        acc = jnp.zeros((8, n2cap), f32)
        # host: num += fmul(g1s[:, d] outer t2[:, d]) in d order
        for d in range(dim):
            acc = acc + g1t[:, d:d + 1] * t2[d:d + 1, :]
        # packet dot v1 = g1 . pi
        a4 = [jnp.zeros((8, 1), f32) for _ in range(4)]
        for k in range(0, k4, 4):
            for l in range(4):
                a4[l] = a4[l] + g1t[:, k + l:k + l + 1] * pi_ref[0, 0, k + l]
        v1 = (a4[0] + a4[2]) + (a4[1] + a4[3])
        for k in range(k4, dim):
            v1 = v1 + g1t[:, k:k + 1] * pi_ref[0, 0, k]
        den = v1 * v2_ref[0]                 # v2 rows identical: den=v1[y]*v2[x]
        s_raw = exact_div(acc, den)

        # ls_log + match_init with the column-major body/tail split
        # (align/scores.py ls_log_add; scores_device._ls_log_add_matrix)
        match_init = pi_ref[0, 1, 0]         # f32, staged in the pi row
        bits = jax.lax.bitcast_convert_type(s_raw, u32)
        e = (bits >> u32(23)).astype(i32) - i32(126)
        ef = e.astype(f32)
        mant = ((bits << u32(9)) >> u32(9)) ^ u32(0x3F000000)
        dmant = jax.lax.bitcast_convert_type(mant, f32)
        q = exact_div(jnp.full_like(dmant, _LS_B), dmant - f32(_LS_C))
        body = (q + match_init) + (ef + f32(_LS_A))
        tail = ((f32(_LS_A) + q) + ef) + match_init
        ys = (t * 8 + jax.lax.broadcasted_iota(i32, (8, 1), 0))
        xs = jax.lax.broadcasted_iota(i32, (1, n2cap), 1)
        pos_cm = ys + xs * n1
        alen = (n1 * scal_ref[b, 1]) & ~i32(3)
        s_ref[0] = jnp.where(pos_cm < alen, body, tail)

    @functools.lru_cache(maxsize=8)
    def make_call_b(B):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, T),
            in_specs=[
                pl.BlockSpec((1, 8, dimp), lambda b, t, s: (b, t, 0)),
                pl.BlockSpec((1, dimp, n2cap), lambda b, t, s: (b, 0, 0)),
                pl.BlockSpec((1, 8, n2cap), lambda b, t, s: (b, 0, 0)),
                pl.BlockSpec((1, 8, 128), lambda b, t, s: (b, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, n2cap), lambda b, t, s: (b * T + t,
                                                             0, 0)),
            ],
        )
        return pl.pallas_call(
            kern_b,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((B * T, 8, n2cap), jnp.float32)],
            interpret=interpret,
        )

    def run(scal, g1s, g2sT, MT, pirow):
        B = g1s.shape[0]
        t2, v2 = make_call_a(B)(g2sT, MT, pirow)
        (s_tiles,) = make_call_b(B)(scal, g1s, t2, v2, pirow)
        return s_tiles.reshape(B, n1p, n2cap)

    return run


def make_s_run(dim: int, n1p: int, n2cap: int, interpret: bool = False):
    """The raw (unjitted) batched exact-S callable — for composing into a
    larger jitted pipeline (e.g. S + shear in graph_dp_pallas)."""
    return _make_s_kernels(dim, n1p, n2cap, interpret)


def exact_s_batch_pallas(g1s, g2s, M, pi, match_init, n1, n2,
                         interpret=False):
    """Bit-exact S for a batch of pairs via the Pallas kernels.

    g1s [B, n1p, dim] f32, g2s [B, n2cap, dim] f32, M [B, dim, dim],
    pi [B, dim], match_init [B] f32, n1/n2 [B] i32 (np arrays).
    Returns a device array S [B, n1p, n2cap] (padded region = garbage the
    caller masks, as with the XLA replay)."""
    import jax.numpy as jnp

    B, n1p, dim = g1s.shape
    n2cap = g2s.shape[1]
    dimp = _pad8(dim)

    g1sp = np.zeros((B, n1p, dimp), np.float32)
    g1sp[:, :, :dim] = g1s
    g2sT = np.zeros((B, dimp, n2cap), np.float32)
    g2sT[:, :dim, :] = np.transpose(g2s, (0, 2, 1))
    MT = np.zeros((B, dimp, 128), np.float32)
    MT[:, :dim, :dim] = np.transpose(M, (0, 2, 1))
    pirow = np.zeros((B, 8, 128), np.float32)
    pirow[:, 0, :dim] = pi
    pirow[:, 1, 0] = np.asarray(match_init, np.float32)
    scal = np.zeros((B, 8), np.int32)
    scal[:, 0] = n1
    scal[:, 1] = n2

    fn = _jitted_run(dim, n1p, n2cap, interpret)
    return fn(jnp.asarray(scal), jnp.asarray(g1sp), jnp.asarray(g2sT),
              jnp.asarray(MT), jnp.asarray(pirow))


@functools.lru_cache(maxsize=32)
def _jitted_run(dim: int, n1p: int, n2cap: int, interpret: bool):
    import jax
    return jax.jit(_make_s_kernels(dim, n1p, n2cap, interpret))
