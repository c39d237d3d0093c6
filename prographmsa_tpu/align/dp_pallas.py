"""Pallas TPU wavefront kernel for the graph-pair DP fill.

One kernel call runs the entire anti-diagonal wavefront with all four DP
matrices resident in VMEM (diagonal coordinates Buf[d, y]), eliminating the
per-step XLA dispatch overhead that dominates a lax.scan formulation.  The
sequence-graph predecessor structure uses the same offset-bucket form as
align/dp_jax.py:

    C1[y, i] = min cost of edge y -> y - o1[i]      (+inf if absent)

Per diagonal d and offset pair (i, j), the candidate matrix values are a
dynamic *sublane* slice of a previous diagonal (cheap on TPU) followed by a
dynamic lane roll by o1[i] (vror). NaN candidates cannot occur here (no +inf operands), so plain maximum matches the host fmax semantics.  The grid batches pairs: one program per
pair, offsets prefetched as scalars.

Semantics mirror /root/reference/src/GraphAlign.h:201-260 in float32; see
align/dp.py for the host parity implementation this is tested against.
"""

from __future__ import annotations

import functools

import numpy as np

from .dp import DPMatrices, NEG_INF
from .dp_jax import _offset_costs, _bucket, _end_state


@functools.lru_cache(maxsize=64)
def _make_kernel(n1p: int, n2p: int, o1p: int, o2p: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = n1p + n2p
    DB = D + 8          # output rows padded to a sublane multiple
    # Finite sentinels: +/-inf operands crash the TPU runtime inside this
    # kernel (observed on v5e), so "impossible" is a large finite negative
    # and infinite edge costs are a large finite positive; row writes are
    # floor-clamped so junk cells cannot drift toward float32 overflow.
    NEG = -1e37

    def kernel(scal_ref,              # [16] int32: o1, o2, n1, n2
               Sdiag_ref,             # [D, n1p] f32 (diag coords, -inf pad)
               C1_ref,                # [o1p, n1p] f32 (transposed)
               C2rev_ref,             # [o2p*R, n1p] f32: reversed-padded C2
                                      # P_j[k] = C2rev[j*R + k//n1p, k%n1p],
                                      # with C2[d-y, j] == P_j[(D-1-d)+y]
               par_ref,               # [8] f32 params (SMEM)
               M_ref, X_ref, Y_ref, W_ref):   # out: [D+1, n1p] f32
        ge = par_ref[0]
        gi = par_ref[1]
        sg = par_ref[2]
        start_init = par_ref[3]
        n1 = scal_ref[o1p + o2p]
        n2 = scal_ref[o1p + o2p + 1]

        ys = jax.lax.broadcasted_iota(jnp.int32, (1, n1p), 1)

        M_ref[:] = jnp.full((DB, n1p), NEG)
        X_ref[:] = jnp.full((DB, n1p), NEG)
        Y_ref[:] = jnp.full((DB, n1p), NEG)
        W_ref[:] = jnp.full((DB, n1p), NEG)
        W_ref[0:1, :] = jnp.where(ys == 0, start_init, NEG)

        def row_at(ref, dd):
            return ref[pl.ds(jnp.maximum(dd, 0), 1), :]          # [1, n1p]

        def shift_rows(row, o):
            """row[0, y] -> row[0, y-o], head filled with -inf."""
            rolled = pltpu.roll(row, o, axis=1)
            return jnp.where(ys >= o, rolled, NEG)

        def body(d, c):
            Sd = Sdiag_ref[pl.ds(d - 1, 1), :]                   # [1, n1p]
            xs = d - ys
            # C2 cost row for this diagonal: value at lane y = C2[d-y, j]
            c2base = D - 1 - d

            def c2row(j):
                # window P_j[c2base : c2base+n1p] assembled from the two
                # spanned rows with full-width rolls (Mosaic hangs on a
                # roll followed by a narrowing slice, and on negative
                # dynamic shifts — both avoided here)
                q = c2base % n1p
                r0 = c2base // n1p
                rowA = C2rev_ref[pl.ds(j * R + r0, 1), :]
                rowB = C2rev_ref[pl.ds(j * R + r0 + 1, 1), :]
                sh = jnp.where(q == 0, 0, n1p - q)
                A = pltpu.roll(rowA, sh, axis=1)
                B = pltpu.roll(rowB, sh, axis=1)
                return jnp.where(ys < n1p - q, A, B)

            c2rows = [c2row(j) for j in range(o2p)]

            Sm = jnp.full((1, n1p), NEG)
            Sy = jnp.full((1, n1p), NEG)
            SyB = jnp.full((1, n1p), NEG)
            for i in range(o1p):
                o1i = scal_ref[i]
                ci = C1_ref[pl.ds(i, 1), :]                      # [1, n1p]
                w_sh = shift_rows(row_at(W_ref, d - o1i), o1i)
                y_sh = shift_rows(row_at(Y_ref, d - o1i), o1i)
                Sy = jnp.maximum(Sy, jnp.maximum(y_sh + ge, w_sh + gi) - ci)
                SyB = jnp.maximum(SyB, jnp.maximum(y_sh + ge, w_sh + sg) - ci)
                for j in range(o2p):
                    o2j = scal_ref[o1p + j]
                    cj = c2rows[j]
                    w2 = shift_rows(row_at(W_ref, d - o1i - o2j), o1i)
                    Sm = jnp.maximum(Sm, ((w2 + Sd) - ci) - cj)

            Sx = jnp.full((1, n1p), NEG)
            SxB = jnp.full((1, n1p), NEG)
            for j in range(o2p):
                o2j = scal_ref[o1p + j]
                cj = c2rows[j]
                xj = row_at(X_ref, d - o2j)
                wj = row_at(W_ref, d - o2j)
                Sx = jnp.maximum(Sx, jnp.maximum(xj + ge, wj + gi) - cj)
                SxB = jnp.maximum(SxB, jnp.maximum(xj + ge, wj + sg) - cj)

            interior = (ys >= 1) & (ys <= n1 - 2) & (xs >= 1) & (xs <= n2 - 2)
            b_x0 = (xs == 0) & (ys >= 1) & (ys <= n1 - 2)
            b_y0 = (ys == 0) & (xs >= 1) & (xs <= n2 - 2)

            Mrow = jnp.where(interior, Sm, NEG)
            Xrow = jnp.where(interior, Sx, jnp.where(b_y0, SxB, NEG))
            Yrow = jnp.where(interior, Sy, jnp.where(b_x0, SyB, NEG))
            Wrow = jnp.where(interior,
                             jnp.maximum(Mrow, jnp.maximum(Xrow, Yrow)),
                             jnp.where(b_x0, SyB, jnp.where(b_y0, SxB, NEG)))

            M_ref[pl.ds(d, 1), :] = jnp.maximum(Mrow, NEG)
            X_ref[pl.ds(d, 1), :] = jnp.maximum(Xrow, NEG)
            Y_ref[pl.ds(d, 1), :] = jnp.maximum(Yrow, NEG)
            W_ref[pl.ds(d, 1), :] = jnp.maximum(Wrow, NEG)
            return c

        jax.lax.fori_loop(1, D, body, 0, unroll=False)

    Lp = 2 * n1p + n2p
    R = Lp // n1p + 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((D, n1p), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o1p, n1p), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o2p * R, n1p), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((DB, n1p), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM)] * 4,
    )

    out_shape = [jax.ShapeDtypeStruct((DB, n1p), jnp.float32)] * 4

    interpret = jax.default_backend() != "tpu"
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)),
    )
    return jax.jit(call)


def fill_dp_pallas(g1, g2, S_host, scores, max_offsets: int = 16,
                   max_bucket: int = 512):
    """Pallas DP fill; returns DPMatrices or None when the pair exceeds the
    offset/size limits (caller falls back to host fill)."""
    import jax.numpy as jnp

    oc1 = _offset_costs(g1, scores, max_offsets)
    oc2 = _offset_costs(g2, scores, max_offsets)
    if oc1 is None or oc2 is None:
        return None
    o1, C1 = oc1
    o2, C2 = oc2
    n1, n2 = g1.size, g2.size
    n1p, n2p = _bucket(max(n1, 8), 128), _bucket(max(n2, 8), 128)
    if n1p > max_bucket or n2p > max_bucket:
        return None
    o1p = _bucket(len(o1), 2)
    o2p = _bucket(len(o2), 2)
    D = n1p + n2p

    COST_INF = np.float32(1e37)
    NEG_B = np.float32(-1e37)
    Sp = np.full((n1p, n2p), NEG_B, dtype=np.float32)
    Sp[:n1, :n2] = S_host
    # S in diagonal coordinates (host, vectorized); diag d at Sdiag[d-1]
    ys = np.arange(n1p)
    xg = np.arange(1, D + 1)[:, None] - ys[None, :]
    inrange = (xg >= 0) & (xg < n2p)
    Sdiag = np.where(inrange, Sp[ys[None, :], np.clip(xg, 0, n2p - 1)],
                     NEG_B).astype(np.float32)
    Sdiag = np.clip(Sdiag, NEG_B, None)
    Sdiag[np.isnan(Sdiag)] = NEG_B
    C1T = np.full((o1p, n1p), COST_INF, dtype=np.float32)
    C1T[:C1.shape[1], :n1] = np.minimum(C1.T, COST_INF)
    # reversed-padded C2, reshaped to R rows of n1p lanes per offset j:
    # P_j[(D-1-d)+y] == C2[d-y, j]; C2rev[j*R + k//n1p, k%n1p] = P_j[k]
    Lp = 2 * n1p + n2p
    R = Lp // n1p + 2
    C2p = np.full((n2p, o2p), COST_INF, dtype=np.float32)
    C2p[:n2, :C2.shape[1]] = np.minimum(C2, COST_INF)
    P = np.full((o2p, R * n1p), COST_INF, dtype=np.float32)
    P[:, n1p:n1p + n2p] = C2p[::-1].T
    C2rev = P.reshape(o2p * R, n1p)

    scal = np.ones(o1p + o2p + 8, dtype=np.int32)
    scal[:len(o1)] = o1
    scal[o1p:o1p + len(o2)] = o2
    scal[o1p + o2p] = n1
    scal[o1p + o2p + 1] = n2

    par = np.zeros(8, dtype=np.float32)
    par[0] = scores.gap_extend
    par[1] = scores.gap_init
    par[2] = scores.start_gap
    par[3] = scores.start_init

    call = _make_kernel(n1p, n2p, o1p, o2p)
    BufM, BufX, BufY, BufW = call(jnp.asarray(scal), jnp.asarray(Sdiag),
                                  jnp.asarray(C1T), jnp.asarray(C2rev),
                                  jnp.asarray(par))

    M = _diags_to_matrix(np.asarray(BufM), n1, n2)
    X = _diags_to_matrix(np.asarray(BufX), n1, n2)
    Y = _diags_to_matrix(np.asarray(BufY), n1, n2)
    W = _diags_to_matrix(np.asarray(BufW), n1, n2)
    for A in (M, X, Y, W):
        A[A <= np.float32(-1e36)] = -np.inf
    W[0, 0] = np.float32(scores.start_init)

    Wend = _end_state(g1, g2, M, X, Y, scores)
    return DPMatrices(M=M, X=X, Y=Y, W=W, S=np.asarray(S_host), Wend=Wend)


def _diags_to_matrix(buf: np.ndarray, n1: int, n2: int) -> np.ndarray:
    out = np.full((n1, n2), NEG_INF, dtype=np.float32)
    ys = np.arange(n1)
    for d in range(0, n1 + n2 - 1):
        xs = d - ys
        ok = (xs >= 0) & (xs < n2)
        out[ys[ok], xs[ok]] = buf[d][ys[ok]]
    return out
