"""Device graph-pair DP: Pallas wavefront fill + batched XLA traceback.

One ``align_pairs_device`` call aligns a BATCH of graph pairs end-to-end
on the chip.  The anti-diagonal wavefront fill
(/root/reference/src/GraphAlign.h:201-280) is a Pallas kernel (grid over
pairs) whose VMEM working set is only the recurrence ring buffers plus
8-row staging windows: the five diagonal-major planes (M/X/Y/W/S) are
STREAMED to HBM by per-block DMA, so sequence length is bounded by HBM,
not VMEM (SURVEY §5 long-context row).  The traceback
(GraphAlign.h:283-517) then runs over those planes as batched XLA under
jit (_make_bt) — Mosaic cannot express it: this toolchain rejects every
dynamic-lane scalar VMEM read ("cannot statically prove that index in
dimension 1 is a multiple of 128"), and a traceback is nothing but
data-dependent cell reads.  Only the mapping vectors are fetched — a few
KB; nothing O(n1*n2) crosses the host link in either direction (critical
on this tunneled TPU: ~25 ms fetch latency, ~15 MB/s), with S computed on
device from the DIM-wide site profiles (align/scores_device.py).

Hardware op selection (probed on the v5e):
  * dynamic *sublane writes* (``ref[pl.ds(d,1),:] = row``) and dynamic DMA
    offsets work; dynamic sublane vector reads hang Mosaic -> recurrence
    row reads go through ring buffers decoded by chained ``jnp.where``
    selects over static rows (exact: pure selection, no arithmetic);
  * dynamic-lane scalar reads do not lower at all (above) -> no in-kernel
    traceback;
  * dynamic lane shifts default to bit-decomposed static ``pltpu.roll``;
    PROGRAPHMSA_PALLAS_DYNROLL=1 switches to a single dynamic roll;
  * +-inf VMEM operands fault the runtime -> finite sentinels: NEG = -1e37
    for "unreachable", +1e37 for infinite edge costs.  Cells on any real
    path get bit-identical f32 values (TPU add/sub round exactly like the
    host); unreachable cells carry a different "minus infinity" the
    traceback's strict-improvement comparisons never select;
  * offset-bucket slots beyond a pair's actual offset count are skipped at
    runtime via ``pl.when`` (each skipped candidate would be a FLOOR no-op
    under fmax, so skipping is order-exact) — ~7x on near-chain levels.

The XLA traceback replays align/backtrack.py's decision procedure exactly
(first argmin of |stored - candidate| over true edges in PredIterator
order == the host scan's strict-improvement rule, hoisted W-state
resolution), so mappings are byte-identical to the host engines.  A
traceback step that *selects* a repeat edge would need
markAlternativePath (GraphAlign.h:166-198) — meta[FAIL] is set and the
caller reruns that pair on the host path.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .dp import NEG_INF
from .dp_jax import _offset_costs, _bucket

NEG = np.float32(-1e37)          # finite "-inf" (inf operands fault v5e)
COST_INF = np.float32(1e37)      # finite "+inf" edge cost
FLOOR = np.float32(-3e38)        # max-accumulator init (< any candidate)
BIG = np.float32(3e38)           # min-accumulator init (> any |diff|)
LANE = 128

ST_M, ST_X, ST_Y = 0, 1, 2       # states, as in align/backtrack.py

META_SCORE, META_LEN, META_FAIL = 0, 1, 2


@functools.lru_cache(maxsize=64)
def _make_kernel(B: int, n1p: int, n2p: int, o1p: int, o2p: int, e1p: int,
                 e2p: int, ring: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = n1p + n2p - 3            # exclusive fill bound (diags 1..D-1)
    DBv = ((D + 7) // 8) * 8 + 8  # row capacity for streamed inputs/scratch
    Lmax = n1p + n2p             # mapping capacity (>= path length + 2)
    R = ring
    RT = R // 8
    dynroll = os.environ.get("PROGRAPHMSA_PALLAS_DYNROLL", "0") == "1"
    NBITS = max(1, (n1p - 1).bit_length())
    I_N1, I_N2 = o1p + o2p, o1p + o2p + 1
    I_L1, I_L2 = o1p + o2p + 2, o1p + o2p + 3

    def kernel(scal_ref,
               Sdiag_ref,                    # ANY [DBv, n1p] f32
               C1T_ref,                      # VMEM [o1p, n1p] f32
               C2diag_ref,                   # ANY [DBv, o2p, n1p] f32
               par_ref,                      # SMEM [B, 16] f32 (unblocked)
               outM_ref, outX_ref, outY_ref, # out ANY [B, DBv, n1p] f32
               outW_ref, outSd_ref,          # (DMA-streamed 8-row windows)
               M_ref, X_ref, Y_ref, W_ref,   # staging [8, n1p] f32
               SdV_ref,                      # staging [8, n1p] f32
               ringM, ringX, ringY, ringW,   # scratch [R, n1p] f32
               accS,                         # scratch [8, n1p] f32
               semout):                      # DMA sem for plane emission
        f32 = jnp.float32
        i32 = jnp.int32
        b = pl.program_id(0)
        ge = par_ref[b, 0]
        gi = par_ref[b, 1]
        sg = par_ref[b, 2]
        start_init = par_ref[b, 3]
        end_match = par_ref[b, 4]
        end_gap = par_ref[b, 5]
        end_skip = par_ref[b, 6]
        n1 = scal_ref[b, I_N1]
        n2 = scal_ref[b, I_N2]
        nlen1 = scal_ref[b, I_L1]
        nlen2 = scal_ref[b, I_L2]

        ys = jax.lax.broadcasted_iota(i32, (1, n1p), 1)
        lmax_ii = jax.lax.broadcasted_iota(i32, (1, Lmax), 1)
        negrow = jnp.full((1, n1p), NEG)


        # ---------------- primitives ----------------
        def ring_row(rg, k, valid):
            """Ring row at traced slot k; NEG row when not valid.  Two-level
            chained where-select (dynamic sublane reads hang Mosaic)."""
            tile = k // 8
            sub = k - tile * 8
            acc = rg[0:8, :]
            for t in range(1, RT):
                acc = jnp.where(tile == t, rg[8 * t:8 * t + 8, :], acc)
            row = acc[0:1, :]
            for r in range(1, 8):
                row = jnp.where(sub == r, acc[r:r + 1, :], row)
            return jnp.where(valid, row, negrow)

        def shift_rows(row, o):
            """row[0, y] -> row[0, y-o], head filled with NEG."""
            if dynroll:
                rolled = pltpu.roll(row, o, axis=1)
            else:
                rolled = row
                for bit in range(NBITS):
                    sh = 1 << bit
                    rolled = jnp.where((o & sh) != 0,
                                       pltpu.roll(rolled, sh, axis=1), rolled)
            return jnp.where(ys >= o, rolled, NEG)

        # ---------------- fill ----------------
        def _fill_one(d, Sd, C2d):
            """One diagonal.  Sd [1, n1p]; C2d [o2p, n1p] (costs at lane y
            = C2[d-y, j]).

            Candidate accumulation goes through VMEM scratch rows so each
            offset slot's body sits under ``pl.when(slot < actual count)``
            — padded slots are SKIPPED at runtime, not just masked.  A
            level of near-chains (2 real offsets in a 16-slot bucket) does
            ~60x less ring-select work.  Order-exact: every skipped
            candidate is a FLOOR no-op under fmax."""
            xs = d - ys
            slot = jax.lax.rem(d, R)

            accS[0:1, :] = jnp.full((1, n1p), FLOOR)   # Sm
            accS[1:2, :] = jnp.full((1, n1p), FLOOR)   # Sy
            accS[2:3, :] = jnp.full((1, n1p), FLOOR)   # SyB
            accS[3:4, :] = jnp.full((1, n1p), FLOOR)   # Sx
            accS[4:5, :] = jnp.full((1, n1p), FLOOR)   # SxB
            for i in range(o1p):
                @pl.when(i < nlen1)
                def _(i=i):
                    o1i = scal_ref[b, i]
                    ci = C1T_ref[0, i:i + 1, :]
                    ki = jax.lax.rem(d - o1i + R, R)
                    vi = d - o1i >= 0
                    w_sh = shift_rows(ring_row(ringW, ki, vi), o1i)
                    y_sh = shift_rows(ring_row(ringY, ki, vi), o1i)
                    accS[1:2, :] = jnp.fmax(
                        accS[1:2, :],
                        jnp.fmax(y_sh + ge, w_sh + gi) - ci)
                    accS[2:3, :] = jnp.fmax(
                        accS[2:3, :],
                        jnp.fmax(y_sh + ge, w_sh + sg) - ci)
                    for j in range(o2p):
                        @pl.when(j < nlen2)
                        def _(i=i, j=j, o1i=o1i, ci=ci):
                            o2j = scal_ref[b, o1p + j]
                            cj = C2d[j:j + 1, :]
                            kij = jax.lax.rem(d - o1i - o2j + 2 * R, R)
                            vij = d - o1i - o2j >= 0
                            w2 = shift_rows(ring_row(ringW, kij, vij), o1i)
                            accS[0:1, :] = jnp.fmax(
                                accS[0:1, :], ((w2 + Sd) - ci) - cj)

            for j in range(o2p):
                @pl.when(j < nlen2)
                def _(j=j):
                    o2j = scal_ref[b, o1p + j]
                    cj = C2d[j:j + 1, :]
                    kj = jax.lax.rem(d - o2j + R, R)
                    vj = d - o2j >= 0
                    xj = ring_row(ringX, kj, vj)
                    wj = ring_row(ringW, kj, vj)
                    accS[3:4, :] = jnp.fmax(
                        accS[3:4, :],
                        jnp.fmax(xj + ge, wj + gi) - cj)
                    accS[4:5, :] = jnp.fmax(
                        accS[4:5, :],
                        jnp.fmax(xj + ge, wj + sg) - cj)
            Sm = accS[0:1, :]
            Sy = accS[1:2, :]
            SyB = accS[2:3, :]
            Sx = accS[3:4, :]
            SxB = accS[4:5, :]

            interior = (ys >= 1) & (ys <= n1 - 2) & (xs >= 1) & (xs <= n2 - 2)
            b_x0 = (xs == 0) & (ys >= 1) & (ys <= n1 - 2)
            b_y0 = (ys == 0) & (xs >= 1) & (xs <= n2 - 2)

            Mrow = jnp.where(interior, Sm, NEG)
            Xrow = jnp.where(interior, Sx, jnp.where(b_y0, SxB, NEG))
            Yrow = jnp.where(interior, Sy, jnp.where(b_x0, SyB, NEG))
            Wrow = jnp.where(interior,
                             jnp.fmax(Mrow, jnp.fmax(Xrow, Yrow)),
                             jnp.where(b_x0, SyB, jnp.where(b_y0, SxB, NEG)))
            Mrow = jnp.maximum(Mrow, NEG)   # clamp junk drift toward -3e38
            Xrow = jnp.maximum(Xrow, NEG)
            Yrow = jnp.maximum(Yrow, NEG)
            Wrow = jnp.maximum(Wrow, NEG)

            trow = jax.lax.rem(d, 8)
            M_ref[pl.ds(trow, 1), :] = Mrow
            X_ref[pl.ds(trow, 1), :] = Xrow
            Y_ref[pl.ds(trow, 1), :] = Yrow
            W_ref[pl.ds(trow, 1), :] = Wrow
            SdV_ref[pl.ds(trow, 1), :] = Sd
            ringM[pl.ds(slot, 1), :] = Mrow
            ringX[pl.ds(slot, 1), :] = Xrow
            ringY[pl.ds(slot, 1), :] = Yrow
            ringW[pl.ds(slot, 1), :] = Wrow

        # init diagonal 0 (cell (0,0))
        w0row = jnp.where(ys == 0, start_init, NEG)
        M_ref[0:1, :] = negrow
        X_ref[0:1, :] = negrow
        Y_ref[0:1, :] = negrow
        W_ref[0:1, :] = w0row
        SdV_ref[0:1, :] = negrow
        ringM[0:1, :] = negrow
        ringX[0:1, :] = negrow
        ringY[0:1, :] = negrow
        ringW[0:1, :] = w0row

        def fill_loop(Swin, C2win, sem1, sem2):
            nblk = (D + 7) // 8

            def flush(base8, nrows):
                for ref, out in ((M_ref, outM_ref), (X_ref, outX_ref),
                                 (Y_ref, outY_ref), (W_ref, outW_ref),
                                 (SdV_ref, outSd_ref)):
                    cp = pltpu.make_async_copy(
                        ref.at[pl.ds(0, nrows)],
                        out.at[b, pl.ds(base8, nrows)], semout)
                    cp.start()
                    cp.wait()

            def blk_body(blk, c):
                base = blk * 8
                cp1 = pltpu.make_async_copy(
                    Sdiag_ref.at[b, pl.ds(base, 8)], Swin, sem1)
                cp2 = pltpu.make_async_copy(
                    C2diag_ref.at[b, pl.ds(base + 1, 8)], C2win, sem2)
                cp1.start()
                cp2.start()
                cp1.wait()
                cp2.wait()
                for t in range(8):
                    d = base + t + 1
                    # plane rows [base, base+8) are all staged exactly
                    # between d=base+7 (t=6, staging row 7) and d=base+8
                    # (t=7, which overwrites staging row 0 = diag base)
                    if t == 7:
                        flush(base, 8)

                    @pl.when(d < D)
                    def _():
                        _fill_one(d, Swin[t:t + 1, :], C2win[t])
                return c

            jax.lax.fori_loop(0, nblk, blk_body, 0)
            # the final block's t=7 diagonal (d = 8*nblk) sits in staging
            # row 0; rows 1..7 of this tail window are past-D junk the
            # traceback never reads (it stops at d <= n1+n2-4 < D)
            flush(nblk * 8, 8)

        pl.run_scoped(
            fill_loop,
            Swin=pltpu.VMEM((8, n1p), jnp.float32),
            C2win=pltpu.VMEM((8, o2p, n1p), jnp.float32),
            sem1=pltpu.SemaphoreType.DMA(()),
            sem2=pltpu.SemaphoreType.DMA(()),
        )


    # --------------- pallas_call wiring ---------------
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # Sdiag (DMA'd)
            pl.BlockSpec((1, o1p, n1p), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),      # C2diag (DMA'd)
            # whole-array SMEM (B x 16 floats, indexed by program_id):
            # a (1, 16) *block* over a [B, 16] array violates Mosaic's
            # block-tiling rule for B > 1 (last two dims must tile (8, 128)
            # or equal the array dims) — unblocked SMEM has no such rule
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        # whole arrays in HBM: the kernel streams 8-row windows into them
        # by DMA, so VMEM never holds an O(D x n1p) plane — sequence
        # length is bounded by HBM, not VMEM
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 5,
        scratch_shapes=[pltpu.VMEM((8, n1p), jnp.float32)] * 5
        + [pltpu.VMEM((ring, n1p), jnp.float32)] * 4
        + [pltpu.VMEM((8, n1p), jnp.float32)]
        + [pltpu.SemaphoreType.DMA(())],
    )

    out_shape = [jax.ShapeDtypeStruct((B, DBv, n1p), jnp.float32)] * 5

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)),
    )
    return jax.jit(call)


@functools.lru_cache(maxsize=64)
def _make_bt(e1p: int, e2p: int, Lmax: int):
    """Batched on-device traceback over the fill kernel's diagonal planes.

    Mosaic cannot lower the traceback (every step is a data-dependent
    dynamic-lane VMEM read, which this toolchain rejects outright), so it
    runs as ordinary XLA under jit, vectorized over the batch: each step
    evaluates every candidate transition of the current state at once and
    takes the FIRST argmin of |stored - candidate| — exactly the host
    scan\'s strict-improvement rule (a later candidate wins only when
    strictly better, so the winner is the first minimum in PredIterator
    order; align/backtrack.py, GraphAlign.h:283-517).  All arithmetic is
    the same f32 adds/subs as the host path, so mappings are
    byte-identical.  Nothing O(n1*n2) leaves the device.
    """
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    NEGc = jnp.float32(NEG)
    BIGc = jnp.float32(BIG)

    def bt(scal, E1i, E1c, E1r, E2i, E2c, E2r, par, PM, PX, PY, PW, PS,
           n1b, n2b):
        B = n1b.shape[0]
        bidx = jnp.arange(B)
        ge, gi = par[:, 0], par[:, 1]
        start_init = par[:, 3]
        end_match, end_gap, end_skip = par[:, 4], par[:, 5], par[:, 6]
        ae1 = jnp.arange(e1p)
        ae2 = jnp.arange(e2p)

        def cellv(P, d, y):
            """P[b, d_b..., y_b...] for index arrays broadcast over b."""
            bb = bidx.reshape((B,) + (1,) * (d.ndim - 1))
            return P[bb, d, y]

        def mval(y, x):
            return jnp.where((y == 0) & (x == 0), NEGc, cellv(PM, y + x, y))

        def xval(y, x):
            return jnp.where((y == 0) & (x == 0), NEGc, cellv(PX, y + x, y))

        def yval(y, x):
            return jnp.where((y == 0) & (x == 0), NEGc, cellv(PY, y + x, y))

        def wval(y, x):
            si = start_init.reshape((B,) + (1,) * (y.ndim - 1))
            return jnp.where((y == 0) & (x == 0), si, cellv(PW, y + x, y))

        def sval(y, x):
            return cellv(PS, y + x, y)

        def resolve_w(ny, nx):
            w = wval(ny, nx)
            m = mval(ny, nx)
            yy = yval(ny, nx)
            xx = xval(ny, nx)
            st = jnp.where(w == m, ST_M, jnp.where(w == yy, ST_Y, ST_X))
            sc = jnp.where(w == m, m, jnp.where(w == yy, yy, xx))
            return sc, st.astype(i32)

        def edges1(y):
            """All e1p edge slots of node y per pair: ([B,e1p] idx, cost,
            rep)."""
            return (E1i[bidx[:, None], y[:, None], ae1[None, :]],
                    E1c[bidx[:, None], y[:, None], ae1[None, :]],
                    E1r[bidx[:, None], y[:, None], ae1[None, :]])

        def edges2(x):
            return (E2i[bidx[:, None], x[:, None], ae2[None, :]],
                    E2c[bidx[:, None], x[:, None], ae2[None, :]],
                    E2r[bidx[:, None], x[:, None], ae2[None, :]])

        yend, xend = n1b - 1, n2b - 1
        E1iE, E1cE, E1rE = edges1(yend)
        E2iE, E2cE, E2rE = edges2(xend)
        yE = jnp.maximum(E1iE, 0)[:, :, None]            # [B, e1p, 1]
        xE = jnp.maximum(E2iE, 0)[:, None, :]            # [B, 1, e2p]
        cyE = E1cE[:, :, None]
        cxE = E2cE[:, None, :]
        vE = (E1iE >= 0)[:, :, None] & (E2iE >= 0)[:, None, :]
        yEb = jnp.broadcast_to(yE, (B, e1p, e2p))
        xEb = jnp.broadcast_to(xE, (B, e1p, e2p))
        mE = mval(yEb, xEb)
        yyE = yval(yEb, xEb)
        xxE = xval(yEb, xEb)
        both0E = (yEb == 0) & (xEb == 0)
        em = end_match[:, None, None]
        eg = end_gap[:, None, None]
        es = end_skip[:, None, None]

        # Wend (GraphAlign.h:262-280): pure max — order-free, all finite
        candE = jnp.fmax(jnp.fmax(((xxE + eg) - cyE) - cxE,
                                  ((yyE + eg) - cyE) - cxE),
                         ((mE + em) - cyE) - cxE)
        candE = jnp.where(both0E, jnp.fmax(candE, (es - cyE) - cxE), candE)
        candE = jnp.where(vE, candE, FLOOR)
        Wend = jnp.fmax(jnp.full(B, FLOOR),
                        candE.reshape(B, -1).max(axis=1))

        # end transition (GraphAlign.h:304-353): first argmin of
        # |Wend - candidate| in scan order (a, bb, [M, Y, X, skip])
        Wb = Wend[:, None, None]
        dM = jnp.abs(Wb - (((mE + em) - cyE) - cxE))
        dY = jnp.abs(Wb - (((yyE + eg) - cyE) - cxE))
        dX = jnp.abs(Wb - (((xxE + eg) - cyE) - cxE))
        dS = jnp.abs(Wb - ((es - cyE) - cxE))
        cand4 = jnp.stack([dM, dY, dX, dS], axis=3)      # [B,e1p,e2p,4]
        v4 = jnp.stack([vE, vE, vE, vE & both0E], axis=3)
        cand4 = jnp.where(v4, cand4, BIGc).reshape(B, -1)
        k0 = jnp.argmin(cand4, axis=1).astype(i32)       # first minimum
        bestE = jnp.take_along_axis(cand4, k0[:, None], axis=1)[:, 0]
        t0_ = k0 % 4
        ab0 = k0 // 4
        a0_ = ab0 // e2p
        b0_ = ab0 % e2p
        flat = lambda A: A.reshape(B, -1)
        pick = lambda A, k: jnp.take_along_axis(flat(A), k[:, None],
                                                axis=1)[:, 0]
        y0 = jnp.where(bestE < BIGc, pick(yEb, ab0), 0).astype(i32)
        x0 = jnp.where(bestE < BIGc, pick(xEb, ab0), 0).astype(i32)
        rep0 = jnp.where(bestE < BIGc,
                         (pick(E1rE[:, :, None] + E2rE[:, None, :], ab0)
                          > 0).astype(i32), 0)
        st0 = jnp.where(t0_ == 0, ST_M,
                        jnp.where(t0_ == 1, ST_Y, ST_X)).astype(i32)
        sc0 = jnp.where(t0_ == 0, pick(mE, ab0),
                        jnp.where(t0_ == 1, pick(yyE, ab0), pick(xxE, ab0)))
        # a winning skip candidate drives (y0, x0) to the origin, so
        # st0/sc0 are never consumed (live0 below is False) — any value ok

        lmax_ii = jnp.arange(Lmax)
        map1 = jnp.full((B, Lmax), -2, i32)
        map2 = jnp.full((B, Lmax), -2, i32)

        def push(maps, pos, y, x, valid):
            m1, m2 = maps
            sel = valid[:, None] & (lmax_ii[None, :] == pos[:, None])
            m1 = jnp.where(sel, y[:, None], m1)
            m2 = jnp.where(sel, x[:, None], m2)
            return (m1, m2), jnp.where(valid, pos + 1, pos)

        def push_state(maps, pos, y, x, st, valid):
            e1_ = jnp.where(st == ST_X, -1, y)
            e2_ = jnp.where(st == ST_Y, -1, x)
            return push(maps, pos, e1_, e2_, valid)

        maps, pos0 = push((map1, map2), jnp.zeros(B, i32), yend, xend,
                          jnp.ones(B, bool))
        live0 = (x0 != 0) | (y0 != 0)
        maps, pos1 = push_state(maps, pos0, y0, x0, st0, live0)

        def bt_cond(s):
            y, x, st, sc, pos, fail, it, maps = s
            return jnp.any(((y != 0) | (x != 0)) & (~fail)) & (it < Lmax)

        def bt_body(s):
            y, x, st, sc, pos, fail, it, maps = s
            act = ((y != 0) | (x != 0)) & (~fail)
            scb = sc[:, None]

            e1i, e1c, e1r = edges1(y)
            e2i, e2c, e2r = edges2(x)
            yp = jnp.maximum(e1i, 0)
            xp = jnp.maximum(e2i, 0)
            v1 = act[:, None] & (e1i >= 0) & (e1c < COST_INF)
            v2 = act[:, None] & (e2i >= 0) & (e2c < COST_INF)

            # STATE_Y (host: backtrack.py:140-155): per a, candidates
            # [yy-move, ww-move] in that order
            yyv = yval(yp, x[:, None])
            wwv = wval(yp, x[:, None])
            dY1 = jnp.abs(scb - ((yyv + ge[:, None]) - e1c))
            dY2 = jnp.abs(scb - ((wwv + gi[:, None]) - e1c))
            vY = (st == ST_Y)[:, None] & v1
            candY = jnp.where(vY[:, :, None],
                              jnp.stack([dY1, dY2], axis=2),
                              BIGc).reshape(B, -1)     # [B, 2*e1p]
            kY = jnp.argmin(candY, axis=1).astype(i32)
            bestY = jnp.take_along_axis(candY, kY[:, None], axis=1)[:, 0]
            aY = kY // 2
            yY = jnp.take_along_axis(yp, aY[:, None], axis=1)[:, 0]
            repY = jnp.take_along_axis(e1r, aY[:, None], axis=1)[:, 0]
            rwY = kY % 2
            scY = jnp.take_along_axis(yyv, aY[:, None], axis=1)[:, 0]

            # STATE_X (backtrack.py:157-172)
            xxv = xval(y[:, None], xp)
            wwx = wval(y[:, None], xp)
            dX1 = jnp.abs(scb - ((xxv + ge[:, None]) - e2c))
            dX2 = jnp.abs(scb - ((wwx + gi[:, None]) - e2c))
            vX = (st == ST_X)[:, None] & v2
            candX = jnp.where(vX[:, :, None],
                              jnp.stack([dX1, dX2], axis=2),
                              BIGc).reshape(B, -1)
            kX = jnp.argmin(candX, axis=1).astype(i32)
            bestX = jnp.take_along_axis(candX, kX[:, None], axis=1)[:, 0]
            aX = kX // 2
            xX = jnp.take_along_axis(xp, aX[:, None], axis=1)[:, 0]
            repX = jnp.take_along_axis(e2r, aX[:, None], axis=1)[:, 0]
            rwX = kX % 2
            scX = jnp.take_along_axis(xxv, aX[:, None], axis=1)[:, 0]

            # STATE_M (backtrack.py:174-185): (a, bb) scan order
            Sv = sval(jnp.maximum(y, 0), jnp.maximum(x, 0))
            ypm = jnp.broadcast_to(yp[:, :, None], (B, e1p, e2p))
            xpm = jnp.broadcast_to(xp[:, None, :], (B, e1p, e2p))
            wwm = wval(ypm, xpm)
            dMc = jnp.abs(scb[:, :, None]
                          - (((wwm + Sv[:, None, None]) - e1c[:, :, None])
                             - e2c[:, None, :]))
            vM = ((st == ST_M)[:, None, None] & v1[:, :, None]
                  & v2[:, None, :])
            candM = jnp.where(vM, dMc, BIGc).reshape(B, -1)
            kM = jnp.argmin(candM, axis=1).astype(i32)
            bestM = jnp.take_along_axis(candM, kM[:, None], axis=1)[:, 0]
            aM = kM // e2p
            bM = kM % e2p
            yM = jnp.take_along_axis(yp, aM[:, None], axis=1)[:, 0]
            xM = jnp.take_along_axis(xp, bM[:, None], axis=1)[:, 0]
            repM = ((jnp.take_along_axis(e1r, aM[:, None], axis=1)[:, 0]
                     + jnp.take_along_axis(e2r, bM[:, None], axis=1)[:, 0])
                    > 0).astype(i32)

            # combine: exactly one state scan is live per lane
            isY = st == ST_Y
            isX = st == ST_X
            best = jnp.where(isY, bestY, jnp.where(isX, bestX, bestM))
            n_y = jnp.where(isY, yY, jnp.where(isX, y, yM))
            n_x = jnp.where(isY, x, jnp.where(isX, xX, xM))
            n_st = jnp.where(isY, ST_Y, jnp.where(isX, ST_X, ST_M))
            n_sc = jnp.where(isY, scY, jnp.where(isX, scX, NEGc))
            n_rep = jnp.where(isY, repY, jnp.where(isX, repX, repM))
            n_rw = jnp.where(isY, rwY, jnp.where(isX, rwX, 1)).astype(i32)
            found = best < BIGc
            n_y = jnp.where(found, n_y, 0)
            n_x = jnp.where(found, n_x, 0)

            rs, rst = resolve_w(n_y, n_x)
            use = (n_rw > 0) & ((n_y != 0) | (n_x != 0)) & found
            n_st = jnp.where(use, rst, n_st)
            n_sc = jnp.where(use, rs, n_sc)

            n_fail = fail | (act & ((n_rep > 0) | (~found)))
            live = (n_x != 0) | (n_y != 0)
            maps, pos = push_state(maps, pos, n_y, n_x, n_st,
                                   act & live & ~n_fail)
            # frozen lanes keep their final state
            n_y = jnp.where(act, n_y, y)
            n_x = jnp.where(act, n_x, x)
            n_st = jnp.where(act, n_st, st)
            n_sc = jnp.where(act, n_sc, sc)
            return (n_y, n_x, n_st, n_sc, pos, n_fail, it + 1, maps)

        y_f, x_f, st_f, sc_f, pos_f, fail_f, _, maps = jax.lax.while_loop(
            bt_cond, bt_body,
            (y0, x0, st0, sc0, pos1, rep0 > 0, i32(0), maps))

        maps, posF = push(maps, pos_f, jnp.zeros(B, i32), jnp.zeros(B, i32),
                          ~fail_f)
        m1, m2 = maps
        meta = jnp.zeros((B, 16), jnp.float32)
        meta = meta.at[:, META_SCORE].set(Wend)
        meta = meta.at[:, META_LEN].set(posF.astype(jnp.float32))
        meta = meta.at[:, META_FAIL].set(fail_f.astype(jnp.float32))
        return m1, m2, meta

    return jax.jit(bt)



def _true_edges_padded(graph, scores, n_pad: int, e_pad: int):
    """True per-node edge lists in PredIterator order with repeat costs
    materialized; NaN costs (inf*0 under repeatext_prob=0) and +inf become
    +1e37, which is decision-equivalent in fill and backtrack."""
    idx, cost, isrep, units = graph.padded()
    n, e = idx.shape
    rep_cost = (np.float32(scores.repeat_init)
                + np.float32(scores.repeat_ext)
                * (units - 1).astype(np.float32))
    with np.errstate(invalid="ignore"):
        cost = np.where(isrep, rep_cost, cost).astype(np.float32)
    cost = np.where(np.isnan(cost) | np.isinf(cost), COST_INF,
                    cost).astype(np.float32)
    cost = np.where(isrep & (units == 0), COST_INF, cost).astype(np.float32)
    ip = np.full((n_pad, e_pad), -1, dtype=np.int32)
    cp = np.full((n_pad, e_pad), COST_INF, dtype=np.float32)
    rp = np.zeros((n_pad, e_pad), dtype=np.int32)
    ip[:n, :e] = idx
    cp[:n, :e] = cost
    rp[:n, :e] = isrep.astype(np.int32)
    return ip, cp, rp


def _pow2(x):
    return 1 << max(0, (int(x) - 1)).bit_length()


def pair_buckets(g1, g2, scores, max_offsets: int = 16):
    """Kernel bucket requirements for a pair, or None if out of range."""
    oc1 = _offset_costs(g1, scores, max_offsets)
    oc2 = _offset_costs(g2, scores, max_offsets)
    if oc1 is None or oc2 is None:
        return None
    o1, _ = oc1
    o2, _ = oc2
    n1p = _bucket(max(g1.size, 16), LANE)
    n2p = _bucket(max(g2.size, 16), LANE)
    # planes are streamed to HBM (not VMEM), so the length ceiling is the
    # HBM plane budget, enforced per-batch in align_pairs_device; 4096 here
    # only bounds a single pair (~1.3 GB of planes) far below HBM
    if n1p > 4096 or n2p > 4096:
        return None
    reach = int(o1.max()) + int(o2.max())
    ring = 64 if reach < 64 else (128 if reach < 128 else None)
    if ring is None:
        return None
    e1p = _pow2(g1.padded()[0].shape[1])
    e2p = _pow2(g2.padded()[0].shape[1])
    if e1p > 16 or e2p > 16:
        return None
    return dict(n1p=n1p, n2p=n2p, o1p=_pow2(len(o1)), o2p=_pow2(len(o2)),
                e1p=e1p, e2p=e2p, ring=ring)


def merge_buckets(bs):
    """Common (batch) bucket set covering every member."""
    return dict((k, max(b[k] for b in bs)) for k in bs[0])


def prepare_pair(g1, g2, scores, max_offsets: int = 16, buckets=None):
    """Host-side preparation of one pair's kernel operands (no S upload —
    the device computes it).  None when the pair exceeds kernel buckets.
    ``buckets`` pads to a common (batch) bucket set."""
    if buckets is None:
        buckets = pair_buckets(g1, g2, scores, max_offsets)
        if buckets is None:
            return None
    oc1 = _offset_costs(g1, scores, max_offsets)
    oc2 = _offset_costs(g2, scores, max_offsets)
    if oc1 is None or oc2 is None:
        return None
    o1, C1 = oc1
    o2, C2 = oc2
    n1, n2 = g1.size, g2.size
    n1p, n2p = buckets["n1p"], buckets["n2p"]
    o1p, o2p = buckets["o1p"], buckets["o2p"]
    e1p, e2p = buckets["e1p"], buckets["e2p"]
    ring = buckets["ring"]
    if (len(o1) > o1p or len(o2) > o2p or n1 > n1p or n2 > n2p
            or g1.padded()[0].shape[1] > e1p
            or g2.padded()[0].shape[1] > e2p):
        return None

    with np.errstate(invalid="ignore"):
        C1T = np.full((o1p, n1p), COST_INF, dtype=np.float32)
        C1T[:C1.shape[1], :n1] = np.nan_to_num(
            C1.T, nan=COST_INF, posinf=COST_INF)
        C2p = np.full((n2p, o2p), COST_INF, dtype=np.float32)
        C2p[:n2, :C2.shape[1]] = np.nan_to_num(
            C2, nan=COST_INF, posinf=COST_INF)

    E1 = _true_edges_padded(g1, scores, n1p, e1p)
    E2 = _true_edges_padded(g2, scores, n2p, e2p)

    o1pad = np.ones(o1p, np.int32)
    o1pad[:len(o1)] = o1
    o2pad = np.ones(o2p, np.int32)
    o2pad[:len(o2)] = o2
    scal = np.concatenate([o1pad, o2pad,
                           np.array([n1, n2, len(o1), len(o2)], np.int32)])

    par = np.zeros(16, dtype=np.float32)
    par[0] = scores.gap_extend
    par[1] = scores.gap_init
    par[2] = scores.start_gap
    par[3] = scores.start_init
    par[4] = scores.end_match
    par[5] = scores.end_gap
    par[6] = scores.end_skip

    return dict(n1=n1, n2=n2, n1p=n1p, n2p=n2p, o1p=o1p, o2p=o2p,
                e1p=e1p, e2p=e2p, ring=ring, scal=scal, C1T=C1T, C2p=C2p,
                par=par, E1=E1, E2=E2)


@functools.lru_cache(maxsize=32)
def _jit_prologue(n1p: int, n2p: int, dim: int):
    """Jitted batched device prologue: exact-S from sites, sheared to
    diag-major, plus C2 reshaped to diag-major (vmapped over pairs)."""
    import jax
    import jax.numpy as jnp
    from .scores_device import make_exact_S

    D = n1p + n2p - 3
    DBv = ((D + 7) // 8) * 8 + 8
    exact_S = make_exact_S(dim)

    def prologue(g1s, g2s, M, pi, match_init, n1, n2, C2p):
        S = exact_S(g1s, g2s, M, pi, match_init, n1, n2)   # [n1p, n2p]
        ys = jnp.arange(n1p)
        # Sdiag row k holds diagonal k+1: Sdiag[k, y] = S[y, k+1-y]
        dgrid = jnp.arange(1, DBv + 1)[:, None]
        xg = dgrid - ys[None, :]
        ok = (xg >= 0) & (xg < n2p)
        Sdiag = jnp.where(ok, S[jnp.broadcast_to(ys[None, :], (DBv, n1p)),
                                jnp.clip(xg, 0, n2p - 1)], NEG)
        Sdiag = jnp.where(jnp.isnan(Sdiag) | (Sdiag < NEG), NEG, Sdiag)
        # C2diag row k holds diagonal k: C2diag[k, j, y] = C2p[k-y, j]
        dg0 = jnp.arange(DBv)[:, None]
        xg0 = dg0 - ys[None, :]
        ok0 = (xg0 >= 0) & (xg0 < C2p.shape[0])
        C2g = C2p[jnp.clip(xg0, 0, C2p.shape[0] - 1)]   # [DBv, n1p, o2p]
        C2g = jnp.where(ok0[:, :, None], C2g, COST_INF)
        C2diag = jnp.transpose(C2g, (0, 2, 1))          # [DBv, o2p, n1p]
        return Sdiag.astype(jnp.float32), C2diag.astype(jnp.float32)

    return jax.jit(jax.vmap(prologue))


@functools.lru_cache(maxsize=8)
def _jit_pack():
    """Pack kernel outputs into one array so the batch costs ONE fetch
    (~25 ms fixed cost per device->host transfer on this tunnel)."""
    import jax
    import jax.numpy as jnp

    def pack(m1, m2, meta):
        m1 = m1.reshape(m1.shape[0], -1)
        m2 = m2.reshape(m2.shape[0], -1)
        meta = meta.reshape(meta.shape[0], -1)
        mi = jax.lax.bitcast_convert_type(meta, jnp.int32)
        return jnp.concatenate([m1, m2, mi], axis=1)

    return jax.jit(pack)


def _host_sdiag(S_host, n1p, n2p, prep):
    """Shear a host-computed S to the kernel's diag-major layout (used on
    non-TPU backends, where XLA:CPU's LLVM-level FMA contraction breaks the
    exact-rounding replay that scores_device relies on; the TPU never
    contracts — probed)."""
    D = n1p + n2p - 3
    DBv = ((D + 7) // 8) * 8 + 8
    n1, n2 = prep["n1"], prep["n2"]
    Sp = np.full((n1p, n2p), NEG, np.float32)
    Sp[:n1, :n2] = S_host
    ys = np.arange(n1p)
    dgrid = np.arange(1, DBv + 1)[:, None]
    xg = dgrid - ys[None, :]
    ok = (xg >= 0) & (xg < n2p)
    Sdiag = np.where(ok, Sp[np.broadcast_to(ys[None, :], (DBv, n1p)),
                            np.clip(xg, 0, n2p - 1)], NEG)
    Sdiag = np.where(np.isnan(Sdiag) | (Sdiag < NEG), NEG,
                     Sdiag).astype(np.float32)
    dg0 = np.arange(DBv)[:, None]
    xg0 = dg0 - ys[None, :]
    C2p = prep["C2p"]
    ok0 = (xg0 >= 0) & (xg0 < C2p.shape[0])
    C2g = np.where(ok0[:, :, None], C2p[np.clip(xg0, 0, C2p.shape[0] - 1)],
                   COST_INF)
    return Sdiag, np.transpose(C2g, (0, 2, 1)).astype(np.float32)


def align_pairs_device(items, interpret=None, s_mode="auto"):
    """Fused device alignment of a BATCH of pairs in one kernel launch and
    ONE result fetch.  ``items``: list of (g1, g2, model, scores).  Returns
    a list of (mapping1, mapping2, score, n_tr_indels) — None per pair on
    bucket overflow / repeat-path bail (caller falls back to host)."""
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    use_device_s = (s_mode == "device") or (s_mode == "auto" and on_tpu)

    results = [None] * len(items)
    bks = []
    for (g1, g2, model, scores) in items:
        bks.append(pair_buckets(g1, g2, scores))
    live = [i for i, b in enumerate(bks) if b is not None]
    if not live:
        return results
    buckets = merge_buckets([bks[i] for i in live])
    preps = {}
    for i in live:
        g1, g2, model, scores = items[i]
        preps[i] = prepare_pair(g1, g2, scores, buckets=buckets)
    live = [i for i in live if preps[i] is not None]
    if not live:
        return results

    n1p, n2p = buckets["n1p"], buckets["n2p"]
    # bound the HBM plane footprint (5 f32 planes of [B, DBv, n1p]): chunk
    # the batch when long sequences would otherwise exhaust device memory
    DBv = ((n1p + n2p - 3 + 7) // 8) * 8 + 8
    plane_bytes_per_pair = 5 * 4 * DBv * n1p
    max_b = max(1, int(4e9 // plane_bytes_per_pair))
    if len(live) > max_b:
        out = list(results)
        for s0 in range(0, len(live), max_b):
            part = [items[i] for i in live[s0:s0 + max_b]]
            sub = align_pairs_device(part, interpret, s_mode)
            for k, i in enumerate(live[s0:s0 + max_b]):
                out[i] = sub[k]
        return out

    B = _pow2(len(live))
    idxs = live + [live[0]] * (B - len(live))    # pad with a duplicate
    dim = items[live[0]][0].dim

    if use_device_s:
        g1sb = np.zeros((B, n1p, dim), np.float32)
        g2sb = np.zeros((B, n2p, dim), np.float32)
        Mb = np.zeros((B, dim, dim), np.float32)
        pib = np.zeros((B, dim), np.float32)
        mib = np.zeros(B, np.float32)
        n1b = np.zeros(B, np.int32)
        n2b = np.zeros(B, np.int32)
        C2pb = np.zeros((B, n2p, buckets["o2p"]), np.float32)
        for k, i in enumerate(idxs):
            g1, g2, model, scores = items[i]
            p = preps[i]
            g1sb[k, :p["n1"]] = g1.sites.astype(np.float32)
            g2sb[k, :p["n2"]] = g2.sites.astype(np.float32)
            Mb[k] = model.M.astype(np.float32)
            pib[k] = model.pi.astype(np.float32)
            mib[k] = np.float32(scores.match_init)
            n1b[k], n2b[k] = p["n1"], p["n2"]
            C2pb[k] = p["C2p"]
        prologue = _jit_prologue(n1p, n2p, dim)
        Sdiag, C2diag = prologue(g1sb, g2sb, Mb, pib, mib, n1b, n2b, C2pb)
    else:
        from .scores import precompute_scores
        Sd_list, C2_list = [], []
        for i in idxs:
            g1, g2, model, scores = items[i]
            S_host = precompute_scores(g1, g2, model, scores)
            sd, c2 = _host_sdiag(S_host, n1p, n2p, preps[i])
            Sd_list.append(sd)
            C2_list.append(c2)
        Sdiag = jnp.asarray(np.stack(Sd_list))
        C2diag = jnp.asarray(np.stack(C2_list))

    def stack(key, sub=None):
        if sub is None:
            return jnp.asarray(np.stack([preps[i][key] for i in idxs]))
        return jnp.asarray(np.stack([preps[i][key][sub] for i in idxs]))

    import time as _time
    dbg = os.environ.get("PROGRAPHMSA_PALLAS_DEBUG", "0") == "1"
    t_mark = _time.perf_counter()

    def _mark(label):
        nonlocal t_mark
        if dbg:
            now = _time.perf_counter()
            print("pallas-batch %-10s %.3f s" % (label, now - t_mark),
                  flush=True)
            t_mark = now

    _mark("prologue")
    kern = _make_kernel(B, n1p, n2p, buckets["o1p"], buckets["o2p"],
                        buckets["e1p"], buckets["e2p"], buckets["ring"],
                        interpret)
    scal_d = stack("scal")
    par_d = stack("par")
    C1T_d = stack("C1T")
    E_d = (stack("E1", 0), stack("E1", 1), stack("E1", 2),
           stack("E2", 0), stack("E2", 1), stack("E2", 2))
    _mark("upload")
    PM, PX, PY, PW, PS = kern(scal_d, Sdiag, C1T_d, C2diag, par_d)
    if dbg:
        PW.block_until_ready()
    _mark("fill")
    Lmax = n1p + n2p
    bt = _make_bt(buckets["e1p"], buckets["e2p"], Lmax)
    n1b = np.array([preps[i]["n1"] for i in idxs], np.int32)
    n2b = np.array([preps[i]["n2"] for i in idxs], np.int32)
    m1, m2, meta = bt(scal_d, *E_d, par_d, PM, PX, PY, PW, PS,
                      jnp.asarray(n1b), jnp.asarray(n2b))
    if dbg:
        meta.block_until_ready()
    _mark("backtrack")
    packed = np.asarray(_jit_pack()(m1, m2, meta))      # ONE fetch
    m1h = packed[:, :Lmax]
    m2h = packed[:, Lmax:2 * Lmax]
    metah = packed[:, 2 * Lmax:].view(np.float32)

    for k, i in enumerate(idxs[:len(live)]):
        if metah[k, META_FAIL] != 0.0:
            continue
        ln = int(metah[k, META_LEN])
        results[i] = (m1h[k][:ln][::-1].tolist(),
                      m2h[k][:ln][::-1].tolist(),
                      np.float32(metah[k, META_SCORE]), 0)
    return results


def align_pair_device(g1, g2, model, scores, interpret=None, s_mode="auto"):
    """Fused device alignment of one pair (batch of 1).  Returns
    (mapping1, mapping2, score, n_tr_indels) or None."""
    return align_pairs_device([(g1, g2, model, scores)], interpret,
                              s_mode)[0]
