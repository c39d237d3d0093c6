"""Device graph-pair DP: sublane-packed Pallas wavefront fill that emits
per-cell decision CODES, plus an arithmetic-free XLA code-chase traceback.

One ``align_pairs_device`` call aligns a BATCH of graph pairs end-to-end on
the chip.  Round-4 redesign of the round-3 kernel (which processed one pair
per grid step on 1/8 of the VPU sublanes and re-derived every traceback
decision with gather storms):

* **8 pairs per grid step, one per sublane.**  Every row op of the
  anti-diagonal wavefront (/root/reference/src/GraphAlign.h:201-280) is an
  (8, n1p) tile — full VPU sublane utilization.  Per-pair offsets, sizes
  and DP parameters are (8, 1) vectors; ring reads and lane shifts take
  per-sublane indices through vector selects.
* **Tier classes instead of one worst-case bucket.**  Pairs are grouped by
  (offset-slot count, ring reach) into static tiers — a chain-dominated
  level runs with 2 offset slots and an 8-slot ring instead of the batch
  max (16, 64/128), cutting the chained ring selects ~8x.  The diagonal
  loop bound is a *runtime* per-group scalar, so group padding and
  mixed-size batches cost only their actual diagonals.
* **The fill emits decision codes; the traceback never re-derives
  scores.**  The reference's backtrack picks the first candidate whose
  recomputed score matches the stored cell (min |difference|, strict
  improvement, PredIterator order — GraphAlign.h:283-517).  Because the
  stored cell IS the max of those same candidates (computed with identical
  f32 op order), the first argmin equals the first strict-improvement
  attainer **during the fill's own max accumulation** — so the kernel
  tracks, per cell, which (offset-slot, move) first attained the running
  max, iterating slots in descending-offset order (= ascending predecessor
  index = PredIterator order; graph/graph.py:18-20).  The packed int32
  code plane is the only O(n1*n2) output — the 5 value planes of round 3
  are gone, cutting HBM traffic ~3.5x.
* **Traceback = code chase.**  An XLA while loop walks the code plane with
  ONE tiny gather per step (plus small table lookups), emitting the
  mapping vectors.  Two exceptions replay the host argmin explicitly with
  values the kernel exports on the side:
    - boundary cells (x==0 / y==0): the fill scored them with
      ``start_gap`` but the backtrack compares candidates built with
      ``gap_init`` (backtrack.py:149), so first-attainer != argmin there;
      the kernel exports the boundary value stripes Y[:,0] / X[0,:] and
      the chase replays backtrack.py:140-172 bit-exactly on them;
    - the end transition (GraphAlign.h:304-353) needs M/X/Y values at the
      end-node predecessors; the kernel streams the last <=128 diagonals
      of M/X/Y to small tail planes and the chase replays the end argmin
      (including Wend itself) from those.
  A step that selects a repeat edge no longer bails the pair (round 5):
  the chase RECORDS the event — (side, next-node, cur-node, emit
  position) into a fixed-capacity per-pair buffer — and walks on; the
  harvest replays markAlternativePath (GraphAlign.h:166-198) on the host
  for just those events and splices the skipped-unit columns into the
  device mapping at the recorded positions (the host appends them at
  exactly those points of its own walk).  Per-(node, offset-bucket)
  "min cost is strictly a repeat edge" bits are host-precomputed.  A cost
  TIE between a repeat and a normal edge resolves to the normal edge and
  records nothing — matching the host, whose PredIterator visits normal
  edges before repeats so ties pick the normal edge there too.  Pairs
  with more than EV_CAP events fall back to the host (fb_rep).

Hardware facts this design encodes (probed on the axon-tunneled v5e):
dynamic sublane *writes* and dynamic DMA offsets lower; dynamic sublane
vector *reads* do not (rings are read by chained per-sublane selects);
+-inf VMEM operands fault (finite sentinels NEG=-1e37 / +1e37 / -3e38);
one host<->device roundtrip costs ~25 ms, so the whole batch is one
kernel launch + one chase launch + ONE packed fetch.
"""

from __future__ import annotations

import functools
import os

import numpy as np

NEG = np.float32(-1e37)          # finite "-inf" (inf operands fault v5e)
COST_INF = np.float32(1e37)      # finite "+inf" edge cost
FLOOR = np.float32(-3e38)        # max-accumulator init (< any candidate)
BIG = np.float32(3e38)           # min-accumulator init (> any |diff|)
LANE = 128

ST_M, ST_X, ST_Y = 0, 1, 2       # states, as in align/backtrack.py
ST_W = 3                         # chase-internal: resolve from wstate

MAX_N = 4096                     # per-side node cap (HBM plane budget)
MAX_OFF = 64                     # offset-slot cap (largest tier's op)

# tiers: (op = offset slots per side, R = ring slots); a pair needs the
# smallest tier with op >= max(nlen1, nlen2) and R >= reach + 2.
# The op >= 32 tiers are SINGLE-PAIR tiers (round 5, for repeat-heavy
# merged graphs whose unit-skip offsets multiply): all 8 sublanes carry
# the same pair, the slot loops run as dynamic fori over the real slot
# count, and decision codes widen to 6-bit fields.
TIERS = ((2, 8), (4, 16), (8, 64), (16, 128), (32, 256), (64, 256))
SINGLE_OP = 32                   # op >= SINGLE_OP -> single-pair tier
GROUP_SPREAD = 40                # max diag spread within a group of 8


def _shb(op: int) -> int:
    """Decision-code slot-field width: 4-bit i/j fields for op <= 16
    (the round-4 layout), 6-bit for the big single-pair tiers."""
    return 4 if op <= 16 else 6


def _tcap(R: int) -> int:
    """Tail-plane diagonal capacity for ring size R: covers the end-region
    window [min_dfull - R - 7, max_dfull + 13] given GROUP_SPREAD."""
    return R + 64

META_SCORE, META_LEN, META_FAIL = 0, 1, 2
EV_CAP = 8                       # repeat events per pair before host bail

# ---------------------------------------------------------------------------
# fallback observability (VERDICT r3 #6): every pair that leaves the device
# path is counted by reason; the level driver surfaces these in --timings.
# fb_rep since round 5 means "more than EV_CAP repeat events or a chase
# failure" — plain repeat steps stay on device via the event splice.
FALLBACK_KEYS = ("pairs_total", "pairs_device", "fb_offsets", "fb_size",
                 "fb_reach", "fb_spread", "fb_rep", "fb_chase")
_fallback_stats = {k: 0 for k in FALLBACK_KEYS}


def fallback_stats():
    return dict(_fallback_stats)


def reset_fallback_stats():
    for k in FALLBACK_KEYS:
        _fallback_stats[k] = 0


# ---------------------------------------------------------------------------
# host-side pair preparation


def _offset_costs_rep(graph, scores, max_offsets: int):
    """Offset-slot costs with repeat flags, in PredIterator candidate order.

    Returns (offsets [m] i32, C [n, m] f32, rep [n, m] bool) or None if
    the graph needs more than ``max_offsets`` slots.  Slots are SPLIT BY
    KIND: repeat-edge offsets (ascending) occupy the front of the array,
    normal-edge offsets (ascending) the back.  The fill and the chase both
    walk slots from the BACK of the array forward, so candidates are
    visited normal-desc-offset (= ascending predecessor index) THEN
    repeat-desc-offset — exactly the host PredIterator's
    normals-before-repeats order (Graph.h:180-248).  This makes
    cross-kind cost TIES resolve to the normal edge like the host (a
    same-offset min over both kinds, as in rounds 3-4, mis-ordered
    repeat-slot candidates against lower-offset normal slots on ties —
    caught by the rep8 fixtures in round 5).

    C[i, k] = min cost over same-kind edges i -> i-offsets[k]
    (normal edges as stored; repeat edges repeat_init +
    repeat_ext*(units-1), NaN (inf*0) => unreachable); rep[i, k] is True
    iff slot k is a repeat slot with a real edge into node i (the chase
    records a markAlternativePath event when it steps through one)."""
    n = graph.size
    off_n, off_r = set(), set()
    for i in range(n):
        for p, _ in graph.preds[i]:
            off_n.add(i - p)
        for p, _ in graph.reps[i]:
            off_r.add(i - p)
    off_n = sorted(off_n)
    off_r = sorted(off_r)
    slots = off_r + off_n
    if len(slots) > max_offsets:
        return None
    m = max(1, len(slots))
    C = np.full((n, m), np.inf, dtype=np.float32)
    rep = np.zeros((n, m), dtype=bool)
    nmap = {o: len(off_r) + k for k, o in enumerate(off_n)}
    rmap = {o: k for k, o in enumerate(off_r)}
    ri = np.float32(scores.repeat_init)
    re = np.float32(scores.repeat_ext)
    for i in range(n):
        for p, c in graph.preds[i]:
            k = nmap[i - p]
            c32 = np.float32(c)
            if c32 < C[i, k]:
                C[i, k] = c32
        for p, u in graph.reps[i]:
            k = rmap[i - p]
            with np.errstate(invalid="ignore"):
                rc = np.float32(ri + re * np.float32(u - 1))
            if np.isnan(rc):
                continue                     # NaN cost: never chosen
            if rc < C[i, k]:
                C[i, k] = rc
            rep[i, k] = True
    return (np.array(slots, dtype=np.int32) if slots
            else np.array([1], dtype=np.int32)), C, rep


def _lane_bucket(n: int) -> int:
    """Pad a node count to the lane-tile bucket.  PROGRAPHMSA_PALLAS_BUCKET
    sets a FLOOR (e.g. 384): classes across tree levels then share one
    kernel shape, cutting the number of distinct Mosaic compiles a cold
    process pays (VERDICT r4 #7) at the cost of some padded lanes."""
    floor = int(os.environ.get("PROGRAPHMSA_PALLAS_BUCKET", LANE))
    return max(LANE, floor, ((n + LANE - 1) // LANE) * LANE)


def _pow2(x: int) -> int:
    return 1 << max(0, (int(x) - 1)).bit_length()


class _PairInfo:
    __slots__ = ("idx", "g1", "g2", "model", "scores", "n1", "n2", "o1",
                 "C1", "rep1", "o2", "C2", "rep2", "tier", "dfull")

    def __init__(self, idx, g1, g2, model, scores):
        self.idx = idx
        self.g1, self.g2 = g1, g2
        self.model, self.scores = model, scores
        self.n1, self.n2 = g1.size, g2.size
        self.dfull = self.n1 + self.n2 - 2


def _prep_pair(idx, g1, g2, model, scores):
    """Bucket/cost tables for one pair, or a fallback-reason string."""
    if g1.size > MAX_N or g2.size > MAX_N:
        return "fb_size"
    oc1 = _offset_costs_rep(g1, scores, MAX_OFF)
    oc2 = _offset_costs_rep(g2, scores, MAX_OFF)
    if oc1 is None or oc2 is None:
        return "fb_offsets"
    info = _PairInfo(idx, g1, g2, model, scores)
    info.o1, info.C1, info.rep1 = oc1
    info.o2, info.C2, info.rep2 = oc2
    # finite sentinel for "no edge": +-inf operands misbehave in VMEM on
    # the v5e (probed round 3), and the chase tests `cost < COST_INF`
    info.C1 = np.where(np.isfinite(info.C1), info.C1,
                       COST_INF).astype(np.float32)
    info.C2 = np.where(np.isfinite(info.C2), info.C2,
                       COST_INF).astype(np.float32)
    reach = int(info.o1.max()) + int(info.o2.max())
    need_op = max(len(info.o1), len(info.o2))
    # PROGRAPHMSA_PALLAS_TIER_FLOOR collapses small tiers into one shared
    # kernel (fewer Mosaic compiles for a cold process; VERDICT r4 #7) at
    # the cost of padded-slot region overhead at runtime
    floor = int(os.environ.get("PROGRAPHMSA_PALLAS_TIER_FLOOR", 0))
    tier = None
    for t, (op, R) in enumerate(TIERS):
        if t < floor and op < SINGLE_OP:
            continue
        if need_op <= op and reach <= R - 2:
            tier = t
            break
    if tier is None:
        return "fb_reach"
    if TIERS[tier][1] >= 256 and max(info.n1, info.n2) > 2048:
        # R=256 ring scratch at n1p > 2048 exceeds the VMEM budget
        return "fb_size"
    info.tier = tier
    return info


# ---------------------------------------------------------------------------
# Pallas fill kernel


@functools.lru_cache(maxsize=64)
def _make_kernel(G: int, n1p: int, n2p: int, DBv: int, op: int, R: int,
                 interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB = max(1, (R - 1).bit_length())    # lane-shift bits (offsets < R)
    RT = max(1, R // 8)                  # ring chunks (two-level select)
    TCAP = _tcap(R)
    SHB = _shb(op)                       # code slot-field width
    single = op >= SINGLE_OP             # single-pair tier (one pair/group)
    f32 = jnp.float32
    i32 = jnp.int32

    def kernel(scal_ref,                 # SMEM [G, 8] i32 (prefetch)
               O1_ref, O2_ref,           # VMEM (1, 8, 128) i32
               IV_ref,                   # VMEM (1, 8, 128) i32 [n1, n2]
               PAR_ref,                  # VMEM (1, 8, 128) f32 [ge,gi,sg,si]
               C1T_ref,                  # VMEM (1, op, 8, n1p) f32
               Sdiag_ref,                # ANY [G, DBv, 8, n1p] f32
               C2c_ref,                  # ANY [G, DBv, 8, 128] f32 (lane-
                                         #   padded: DMA slices must align)
               codes_out,                # ANY [G, DBv, 8, n1p] i32
               tailM_out, tailX_out, tailY_out,   # ANY [G, TCAP, 8, n1p]
               stripeY_ref, stripeX_ref,          # VMEM (1, 8, n1p) f32
               codes_st,                 # scratch (8, 8, n1p) i32
               tailM_st, tailX_st, tailY_st,      # scratch (8, 8, n1p) f32
               ringW, ringY, ringX,               # scratch (R, 8, n1p) f32
               C2w_ref,                  # scratch (op, 8, n1p) f32
               accV,                     # scratch (5, 8, n1p) f32
               accC,                     # scratch (3, 8, n1p) i32
               semout):
        g = pl.program_id(0)
        nblk = scal_ref[g, 0]
        end_lo = scal_ref[g, 1]
        nlen1max = scal_ref[g, 2]
        nlen2max = scal_ref[g, 3]

        O1v = O1_ref[0]                  # (8, 128) i32
        O2v = O2_ref[0]

        def o_smem(which, idx):
            """Offset value per sublane as an (8,1) vector from the SMEM
            scalar table (used by the fori M-loop, where the slot index is
            traced and a VMEM lane read would be dynamic-lane)."""
            base = 8 + which * 8 * op
            si = jax.lax.broadcasted_iota(i32, (8, 1), 0)
            acc = jnp.zeros((8, 1), i32)
            for s in range(8):
                acc = jnp.where(si == s, scal_ref[g, base + s * op + idx],
                                acc)
            return acc
        iv = IV_ref[0]
        n1 = iv[:, 0:1]                  # (8, 1) i32
        n2 = iv[:, 1:2]
        par = PAR_ref[0]
        ge = par[:, 0:1]                 # (8, 1) f32
        gi = par[:, 1:2]
        sg = par[:, 2:3]
        si = par[:, 3:4]

        ys = jax.lax.broadcasted_iota(i32, (1, n1p), 1)
        xsl = jax.lax.broadcasted_iota(i32, (1, n2p), 1)
        neg8 = jnp.full((8, n1p), NEG)
        IY, IYB, IX, IXB, IM = 0, 1, 2, 3, 4
        CY, CX, CM = 0, 1, 2

        def ring_read(rg, kvec, valid):
            """Ring slot kvec (8,1) per-sublane; NEG rows when not valid.
            Two-level chained select (dynamic sublane reads hang Mosaic):
            RT chunk selects on (8, 8, n1p) then 8 row selects — R/8 + 8
            instructions instead of R."""
            kc = kvec.reshape(1, 8, 1)
            tile = kc // 8
            sub = kc - tile * 8
            acc3 = rg[0:8]
            for t in range(1, RT):
                acc3 = jnp.where(tile == t, rg[8 * t:8 * t + 8], acc3)
            row = acc3[0]
            for r in range(1, min(8, R)):
                row = jnp.where(sub[0] == r, acc3[r], row)
            return jnp.where(valid, row, NEG)

        def shift_rows(row, o):
            """row[s, y] -> row[s, y - o[s]], head lanes filled with NEG."""
            r = row
            for bit in range(NB):
                sh = 1 << bit
                r = jnp.where((o & sh) != 0, pltpu.roll(r, sh, axis=1), r)
            return jnp.where(ys >= o, r, NEG)

        def acc_cand(slotV, slotC, cand, code):
            """Strict-improvement max + first-attainer code tracking."""
            a = accV[slotV]
            upd = cand > a
            accV[slotV] = jnp.where(upd, cand, a)
            accC[slotC] = jnp.where(upd, code, accC[slotC])

        def when_slot(cond):
            """Skip padded offset slots at runtime — but only for the big
            tiers: a pl.when region costs ~2.4 us on this chip (measured),
            so for op <= 4 running the padded slots unconditionally is
            cheaper (their COST_INF candidates are FLOOR no-ops under the
            strict-improvement accumulate)."""
            if op >= 8:
                return pl.when(cond)
            return lambda f: f()

        def _fill_one(d, Sd, C2ins):
            """One diagonal.  Sd (8, n1p): S row of diag d; C2ins (8, op)
            ((op, 128) in single mode): C2 costs of edges into node x = d
            (per pair, per slot)."""
            xs = d - ys
            slot = jax.lax.rem(d, R)

            # C2 window roll: C2w[j][s, y] = C2 cost into node (d - y) at
            # offset slot j — a lane roll + head insert per diagonal
            # replaces round 3's O(D*o2p*n1p) sheared HBM array
            if single:
                # one bulk 3D roll of every slot (all sublanes carry the
                # same pair, so the insert broadcasts over sublanes)
                ins3 = C2ins[:, 0:1][:, :, None]          # (op, 1, 1)
                ys3 = jax.lax.broadcasted_iota(i32, (1, 1, n1p), 2)
                C2w_ref[:] = jnp.where(ys3 == 0, ins3,
                                       pltpu.roll(C2w_ref[:], 1, axis=2))
            else:
                for j in range(op):
                    @when_slot(j < nlen2max)
                    def _(j=j):
                        ins = C2ins[:, j:j + 1]
                        C2w_ref[j] = jnp.where(ys == 0, ins,
                                               pltpu.roll(C2w_ref[j], 1,
                                                          axis=1))

            accV[IY] = jnp.full((8, n1p), FLOOR)
            accV[IYB] = jnp.full((8, n1p), FLOOR)
            accV[IX] = jnp.full((8, n1p), FLOOR)
            accV[IXB] = jnp.full((8, n1p), FLOOR)
            accV[IM] = jnp.full((8, n1p), FLOOR)
            accC[CY] = jnp.zeros((8, n1p), i32)
            accC[CX] = jnp.zeros((8, n1p), i32)
            accC[CM] = jnp.zeros((8, n1p), i32)

            # g1-offset slots in DESCENDING slot order = PredIterator
            # candidate order (normal desc-offset then repeat desc-offset
            # with the kind-split slot arrays; tie-break parity)
            if single:
                def y_body(ii, c0):
                    i = nlen1max - 1 - ii
                    o1i = o_smem(0, i)
                    ci = C1T_ref[0, pl.ds(i, 1)][0]
                    ki = jax.lax.rem(d - o1i + R, R)
                    vi = d - o1i >= 0
                    w_sh = shift_rows(ring_read(ringW, ki, vi), o1i)
                    y_sh = shift_rows(ring_read(ringY, ki, vi), o1i)
                    t_ge = y_sh + ge
                    acc_cand(IY, CY, t_ge - ci, (i << 1) | 0)
                    acc_cand(IY, CY, (w_sh + gi) - ci, (i << 1) | 1)
                    accV[IYB] = jnp.fmax(accV[IYB],
                                         jnp.fmax(t_ge, w_sh + sg) - ci)
                    return c0

                jax.lax.fori_loop(0, nlen1max, y_body, 0)
            else:
                for i in reversed(range(op)):
                    @when_slot(i < nlen1max)
                    def _(i=i):
                        o1i = O1v[:, i:i + 1]
                        ci = C1T_ref[0][i]
                        ki = jax.lax.rem(d - o1i + R, R)
                        vi = d - o1i >= 0
                        w_sh = shift_rows(ring_read(ringW, ki, vi), o1i)
                        y_sh = shift_rows(ring_read(ringY, ki, vi), o1i)
                        t_ge = y_sh + ge
                        # Y candidates in per-edge order: Y then W move
                        acc_cand(IY, CY, t_ge - ci, (i << 1) | 0)
                        acc_cand(IY, CY, (w_sh + gi) - ci, (i << 1) | 1)
                        accV[IYB] = jnp.fmax(accV[IYB],
                                             jnp.fmax(t_ge, w_sh + sg) - ci)
                        if op < 8:
                            for j in reversed(range(op)):
                                @when_slot(j < nlen2max)
                                def _(i=i, j=j, o1i=o1i, ci=ci):
                                    o2j = O2v[:, j:j + 1]
                                    kij = jax.lax.rem(d - o1i - o2j
                                                      + 2 * R, R)
                                    vij = d - o1i - o2j >= 0
                                    w2 = shift_rows(
                                        ring_read(ringW, kij, vij), o1i)
                                    acc_cand(IM, CM,
                                             ((w2 + Sd) - ci) - C2w_ref[j],
                                             (i << SHB) | j)

            if op >= 8:
                # M accumulation as nested fori over the REAL slot counts:
                # an op x op static unroll costs minutes of Mosaic compile
                # at op=16 and pays region overhead per padded slot; the
                # dynamic loop visits only group-max slots (descending
                # offsets on both axes, as above)
                def m_outer(ii, c0):
                    i = nlen1max - 1 - ii
                    o1i = o_smem(0, i)
                    ci = C1T_ref[0, pl.ds(i, 1)][0]

                    def m_inner(jj, c1):
                        j = nlen2max - 1 - jj
                        o2j = o_smem(1, j)
                        kij = jax.lax.rem(d - o1i - o2j + 2 * R, R)
                        vij = d - o1i - o2j >= 0
                        w2 = shift_rows(ring_read(ringW, kij, vij), o1i)
                        cj = C2w_ref[pl.ds(j, 1)][0]
                        acc_cand(IM, CM, ((w2 + Sd) - ci) - cj,
                                 (i << SHB) | j)
                        return c1

                    jax.lax.fori_loop(0, nlen2max, m_inner, 0)
                    return c0

                jax.lax.fori_loop(0, nlen1max, m_outer, 0)

            if single:
                def x_body(jj, c0):
                    j = nlen2max - 1 - jj
                    o2j = o_smem(1, j)
                    cj = C2w_ref[pl.ds(j, 1)][0]
                    kj = jax.lax.rem(d - o2j + R, R)
                    vj = d - o2j >= 0
                    xj = ring_read(ringX, kj, vj)
                    wj = ring_read(ringW, kj, vj)
                    t_ge = xj + ge
                    acc_cand(IX, CX, t_ge - cj, (j << 1) | 0)
                    acc_cand(IX, CX, (wj + gi) - cj, (j << 1) | 1)
                    accV[IXB] = jnp.fmax(accV[IXB],
                                         jnp.fmax(t_ge, wj + sg) - cj)
                    return c0

                jax.lax.fori_loop(0, nlen2max, x_body, 0)
            else:
                for j in reversed(range(op)):
                    @when_slot(j < nlen2max)
                    def _(j=j):
                        o2j = O2v[:, j:j + 1]
                        cj = C2w_ref[j]
                        kj = jax.lax.rem(d - o2j + R, R)
                        vj = d - o2j >= 0
                        xj = ring_read(ringX, kj, vj)
                        wj = ring_read(ringW, kj, vj)
                        t_ge = xj + ge
                        acc_cand(IX, CX, t_ge - cj, (j << 1) | 0)
                        acc_cand(IX, CX, (wj + gi) - cj, (j << 1) | 1)
                        accV[IXB] = jnp.fmax(accV[IXB],
                                             jnp.fmax(t_ge, wj + sg) - cj)

            interior = (ys >= 1) & (ys <= n1 - 2) & (xs >= 1) & (xs <= n2 - 2)
            b_x0 = (xs == 0) & (ys >= 1) & (ys <= n1 - 2)
            b_y0 = (ys == 0) & (xs >= 1) & (xs <= n2 - 2)

            Sm, Sy, SyB = accV[IM], accV[IY], accV[IYB]
            Sx, SxB = accV[IX], accV[IXB]
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

            # W-state resolution order M, Y, X (backtrack.py:130-137)
            wst = jnp.where(Wrow == Mrow, ST_M,
                            jnp.where(Wrow == Yrow, ST_Y, ST_X)).astype(i32)
            code = (accC[CM] | (accC[CY] << (2 * SHB))
                    | (accC[CX] << (3 * SHB + 1))
                    | (wst << (4 * SHB + 2)))

            trow = jax.lax.rem(d, 8)
            codes_st[pl.ds(trow, 1)] = code[None]
            ringW[pl.ds(slot, 1)] = Wrow[None]
            ringY[pl.ds(slot, 1)] = Yrow[None]
            ringX[pl.ds(slot, 1)] = Xrow[None]

            # boundary value stripes: stripeY[s, y] = Y[y, 0] (== W[y, 0]),
            # stripeX[s, x] = X[0, x] (== W[0, x]); consumed by the chase's
            # boundary argmin replay (backtrack.py:140-172).  stripeX is
            # n2p (not n1p) lanes wide and indexed by its OWN lane iota:
            # x runs to n2-1, which exceeds n1p for asymmetric pairs
            # (ADVICE r4 high — the old n1p-wide stripe silently dropped
            # boundary values for d >= n1p)
            stripeY_ref[0] = jnp.where(ys == d, Yrow, stripeY_ref[0])
            stripeX_ref[0] = jnp.where(xsl == d, Xrow[:, 0:1],
                                       stripeX_ref[0])

            # tail staging is unconditional (cheap, and keeps the DMA
            # schedule branch-free); the flush clamps its destination, so
            # pre-region blocks overwrite tail rows [0, 8) and the
            # in-region blocks land last (ascending flush order)
            tailM_st[pl.ds(trow, 1)] = Mrow[None]
            tailX_st[pl.ds(trow, 1)] = Xrow[None]
            tailY_st[pl.ds(trow, 1)] = Yrow[None]

        # ---- init: diagonal 0 (cell (0,0)) ----
        w0row = jnp.where(ys == 0, si, NEG)
        ringW[0:1] = w0row[None]
        ringY[0:1] = neg8[None]
        ringX[0:1] = neg8[None]
        codes_st[0:1] = jnp.zeros((1, 8, n1p), i32)
        tailM_st[0:1] = neg8[None]
        tailX_st[0:1] = neg8[None]
        tailY_st[0:1] = neg8[None]
        stripeY_ref[0] = neg8
        stripeX_ref[0] = jnp.full((8, n2p), NEG)
        C2w_ref[:] = jnp.full((op, 8, n1p), COST_INF)

        def fill_loop(Swin, C2win, sem1, sem2):
            def flush(base8):
                cp = pltpu.make_async_copy(
                    codes_st.at[:], codes_out.at[g, pl.ds(base8, 8)], semout)
                cp.start()
                cp.wait()
                # unconditional with clamped destination: blocks below the
                # end region all target rows [0, 8) and are overwritten by
                # the base8 == end_lo block (ascending base8 order)
                tb = jnp.maximum(base8 - end_lo, 0)
                tb = jnp.minimum(tb, TCAP - 8)
                for st_ref, out in ((tailM_st, tailM_out),
                                    (tailX_st, tailX_out),
                                    (tailY_st, tailY_out)):
                    cp2 = pltpu.make_async_copy(
                        st_ref.at[:], out.at[g, pl.ds(tb, 8)], semout)
                    cp2.start()
                    cp2.wait()

            def blk_body(blk, c):
                base = blk * 8
                cp1 = pltpu.make_async_copy(
                    Sdiag_ref.at[g, pl.ds(base, 8)], Swin, sem1)
                cp2 = pltpu.make_async_copy(
                    C2c_ref.at[g, pl.ds(base + 1, 8)], C2win, sem2)
                cp1.start()
                cp2.start()
                cp1.wait()
                cp2.wait()
                for t in range(8):
                    d = base + t + 1
                    # staging rows [base, base+8) are all complete exactly
                    # between d=base+7 (t=6, row 7) and d=base+8 (t=7,
                    # which overwrites row 0 = diag base)
                    if t == 7:
                        flush(base)
                    _fill_one(d, Swin[t], C2win[t])
                return c

            jax.lax.fori_loop(0, nblk, blk_body, 0)
            flush(nblk * 8)

        pl.run_scoped(
            fill_loop,
            Swin=pltpu.VMEM((8, 8, n1p), jnp.float32),
            C2win=pltpu.VMEM((8, op, 128) if single else (8, 8, 128),
                             jnp.float32),
            sem1=pltpu.SemaphoreType.DMA(()),
            sem2=pltpu.SemaphoreType.DMA(()),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),        # O1
            pl.BlockSpec((1, 8, 128), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),        # O2
            pl.BlockSpec((1, 8, 128), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),        # IV
            pl.BlockSpec((1, 8, 128), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),        # PAR
            pl.BlockSpec((1, op, 8, n1p), lambda g, s: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),        # C1T
            pl.BlockSpec(memory_space=pltpu.ANY),         # Sdiag (DMA'd)
            pl.BlockSpec(memory_space=pltpu.ANY),         # C2c (DMA'd)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),         # codes
            pl.BlockSpec(memory_space=pltpu.ANY),         # tailM
            pl.BlockSpec(memory_space=pltpu.ANY),         # tailX
            pl.BlockSpec(memory_space=pltpu.ANY),         # tailY
            pl.BlockSpec((1, 8, n1p), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),        # stripeY
            pl.BlockSpec((1, 8, n2p), lambda g, s: (g, 0, 0),
                         memory_space=pltpu.VMEM),        # stripeX
        ],
        scratch_shapes=[pltpu.VMEM((8, 8, n1p), jnp.int32)]       # codes_st
        + [pltpu.VMEM((8, 8, n1p), jnp.float32)] * 3              # tail st
        + [pltpu.VMEM((R, 8, n1p), jnp.float32)] * 3              # rings
        + [pltpu.VMEM((op, 8, n1p), jnp.float32)]                 # C2w
        + [pltpu.VMEM((5, 8, n1p), jnp.float32)]                  # accV
        + [pltpu.VMEM((3, 8, n1p), jnp.int32)]                    # accC
        + [pltpu.SemaphoreType.DMA(())],
    )

    out_shape = [
        jax.ShapeDtypeStruct((G, DBv, 8, n1p), jnp.int32),
        jax.ShapeDtypeStruct((G, TCAP, 8, n1p), jnp.float32),
        jax.ShapeDtypeStruct((G, TCAP, 8, n1p), jnp.float32),
        jax.ShapeDtypeStruct((G, TCAP, 8, n1p), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, n1p), jnp.float32),
        jax.ShapeDtypeStruct((G, 8, n2p), jnp.float32),
    ]

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024)),
    )

    def wrapped(scal, O1, O2, IV, PAR, C1T, Sdiag, C2c):
        if single:
            # single-pair tiers ship C2c as [G, DBv, op, 128] directly
            return call(scal, O1, O2, IV, PAR, C1T, Sdiag, C2c)
        # the C2 cost array travels compact [G, DBv, 8, op] and is padded
        # to the 128-lane tile on device (DMA slices must be lane-aligned)
        C2p = jnp.pad(C2c, ((0, 0), (0, 0), (0, 0), (0, 128 - op)),
                      constant_values=COST_INF)
        return call(scal, O1, O2, IV, PAR, C1T, Sdiag, C2p)

    return jax.jit(wrapped)


# ---------------------------------------------------------------------------
# device prologue: exact S, sheared to group-major diagonal layout


@functools.lru_cache(maxsize=8)
def _make_prologue(dim: int):
    import jax
    import jax.numpy as jnp
    from .scores_device import make_exact_S

    exact_S = make_exact_S(dim)

    def prologue(g1s, g2s, M, pi, match_init, n1, n2):
        """-> Sdiag [G, DBv, 8, n1p]; row k of the diag dim = S diagonal
        k+1 (Sdiag[.., k, s, y] = S[y, k+1-y]).  Shapes: g1s [B, n1p, dim],
        g2s [B, n2cap, dim]; B = 8*G; DBv inferred from n1p + n2cap."""
        B, n1p, _ = g1s.shape
        n2cap = g2s.shape[1]
        DBv = _dbv_for(n1p, n2cap)

        def one(g1s_, g2s_, M_, pi_, mi_, n1_, n2_):
            S = exact_S(g1s_, g2s_, M_, pi_, mi_, n1_, n2_)   # [n1p, n2cap]
            # gather-free shear (TPU gathers serialize — measured 4x the
            # whole fill at L=3500): pad each row then reinterpret with
            # width W2-1, which lands S[y, x] at [y, x + y]; transposing
            # gives the diagonal-major plane (same trick as the NW kernel)
            P = DBv + 2 - n2cap
            A = jnp.pad(S, ((0, 0), (0, P)), constant_values=NEG)
            W2 = n2cap + P - 1
            T = A.reshape(-1)[:n1p * W2].reshape(n1p, W2)
            Sd = T[:, 1:DBv + 1].T                            # [DBv, n1p]
            return jnp.where(jnp.isnan(Sd) | (Sd < NEG), NEG, Sd)

        # lax.map over chunks: a flat vmap over the whole batch holds O(B)
        # full-S temporaries at once — 2000-residue batches OOM HBM.  For
        # very long sequences even one group of 8 is too much; sweep pair
        # by pair (the per-step work is huge, so map overhead is noise).
        chunk = _prologue_chunk(n1p, n2cap, B)
        nch = B // chunk
        def grp(args):
            return jax.vmap(one)(*args)

        Sdiag = jax.lax.map(grp, tuple(
            a.reshape((nch, chunk) + a.shape[1:])
            for a in (g1s, g2s, M, pi, match_init, n1, n2)))
        Sdiag = Sdiag.reshape(B // 8, 8, DBv, n1p)
        return jnp.transpose(Sdiag, (0, 2, 1, 3)).astype(jnp.float32)

    return jax.jit(prologue, static_argnames=())


@functools.lru_cache(maxsize=16)
def _make_prologue_pallas_fn(dim: int, n1p: int, n2cap: int, DBv: int):
    """ONE jitted pipeline: Pallas exact-S kernels + gather-free shear +
    group transpose -> Sdiag [g, DBv, 8, n1p] (one dispatch per chunk)."""
    import jax
    import jax.numpy as jnp

    from .scores_pallas import make_s_run

    run = make_s_run(dim, n1p, n2cap, False)

    def f(scal, g1sp, g2sT, MT, pirow):
        S = run(scal, g1sp, g2sT, MT, pirow)          # [b, n1p, n2cap]
        P = DBv + 2 - n2cap
        A = jnp.pad(S, ((0, 0), (0, 0), (0, P)), constant_values=NEG)
        W2 = n2cap + P - 1
        b = S.shape[0]
        T = A.reshape(b, -1)[:, :n1p * W2].reshape(b, n1p, W2)
        Sd = jnp.transpose(T[:, :, 1:DBv + 1], (0, 2, 1))
        Sd = jnp.where(jnp.isnan(Sd) | (Sd < NEG), NEG, Sd)
        return jnp.transpose(Sd.reshape(b // 8, 8, DBv, n1p), (0, 2, 1, 3))

    return jax.jit(f)


def _prologue_pallas(flat, n1p, n2cap, DBv, timers=None):
    """Sdiag via the one-pass Pallas exact-S kernels (scores_pallas.py):
    S crosses HBM once instead of the ~25 barriered passes of the XLA
    replay (VERDICT r4 #2).  Host arrays are built directly in kernel
    layout; chunked over pair groups so transients stay bounded, chunks
    share one compile (the tail chunk is zero-padded up)."""
    import jax.numpy as jnp

    from .scores_pallas import _pad8

    dim = flat[0].g1.dim
    dimp = _pad8(dim)
    B = len(flat)
    g1sp = np.zeros((B, n1p, dimp), np.float32)
    g2sT = np.zeros((B, dimp, n2cap), np.float32)
    MT = np.zeros((B, dimp, 128), np.float32)
    pirow = np.zeros((B, 8, 128), np.float32)
    scal = np.zeros((B, 8), np.int32)
    for b, info in enumerate(flat):
        g1sp[b, :info.n1, :dim] = info.g1.sites
        g2sT[b, :dim, :info.n2] = info.g2.sites.T
        MT[b, :dim, :dim] = info.model.M.T
        pirow[b, 0, :dim] = info.model.pi
        pirow[b, 1, 0] = np.float32(info.scores.match_init)
        scal[b, 0] = info.n1
        scal[b, 1] = info.n2
    fn = _make_prologue_pallas_fn(dim, n1p, n2cap, DBv)
    per_pair = 3 * n1p * n2cap * 4
    chunk = int(min(B, max(8, (1.6e9 // per_pair) // 8 * 8)))
    outs = []
    for lo in range(0, B, chunk):
        hi = min(B, lo + chunk)
        pad = chunk - (hi - lo)

        def pad0(a):
            if pad == 0:
                return a[lo:hi]
            return np.concatenate(
                [a[lo:hi], np.zeros((pad,) + a.shape[1:], a.dtype)])

        args = (jnp.asarray(pad0(scal)), jnp.asarray(pad0(g1sp)),
                jnp.asarray(pad0(g2sT)), jnp.asarray(pad0(MT)),
                jnp.asarray(pad0(pirow)))
        if timers is not None:   # split host-build+upload from the S
            for a in args:       # kernels (on a tunnel the upload+sync
                a.block_until_ready()   # latency dwarfs the compute)
            timers("prologue_upload")
        outs.append(fn(*args)[:(hi - lo) // 8] if pad else fn(*args))
    return jnp.concatenate(outs, 0) if len(outs) > 1 else outs[0]


def _prologue_chunk(n1p: int, n2cap: int, B: int = 8) -> int:
    """Pairs per exact-S sweep: the replay holds ~6 S-sized temporaries
    per pair (double-buffered by lax.map), so pick the largest power-of-2
    chunk whose sweep stays under ~1.6 GB — the whole batch for short
    sequences (map steps serialize and cost more than they save), 8 at
    L~2000, 4 at the 4096 cap."""
    per_pair = 12 * n1p * n2cap * 4
    cap = max(1, int(1.6e9 // per_pair))
    chunk = 1
    # the lax.map reshape needs chunk | B, and mesh padding can make B a
    # non-power-of-two (e.g. G padded to a multiple of 3 devices): take
    # the largest power-of-two DIVISOR of B under the cap (ADVICE r4)
    while chunk * 2 <= min(cap, B) and B % (chunk * 2) == 0:
        chunk *= 2
    return chunk


def _dbv_for(n1p: int, n2cap: int) -> int:
    """Static diag capacity covering fill + DMA windows, bucketed to 256
    multiples so kernel shapes repeat across levels."""
    need = n1p + n2cap + 16
    return ((need + 255) // 256) * 256


def _host_sdiag_group(infos_grp, n1p, DBv):
    """Host-computed exact S (non-TPU backends: XLA:CPU's FMA contraction
    breaks the device replay) sheared to the group layout."""
    from .scores import precompute_scores

    Sdiag = np.full((len(infos_grp), DBv, 8, n1p), NEG, np.float32)
    ys = np.arange(n1p)
    dgrid = np.arange(1, DBv + 1)[:, None]
    xg = dgrid - ys[None, :]
    for gi_, group in enumerate(infos_grp):
        for s, info in enumerate(group):
            if info.idx < 0:
                continue                      # dummy pad pair: S stays NEG
            S = precompute_scores(info.g1, info.g2, info.model, info.scores)
            n1, n2 = info.n1, info.n2
            Sp = np.full((n1p, max(n2, 1)), NEG, np.float32)
            Sp[:n1, :n2] = S
            ok = (xg >= 0) & (xg < n2)
            Sd = np.where(ok, Sp[np.broadcast_to(ys[None, :], (DBv, n1p)),
                                 np.clip(xg, 0, n2 - 1)], NEG)
            Sdiag[gi_, :, s, :] = np.where(np.isnan(Sd) | (Sd < NEG), NEG,
                                           Sd)
    return Sdiag


# ---------------------------------------------------------------------------
# XLA code chase (traceback)


@functools.lru_cache(maxsize=4)
def _make_chase():
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    NEGc = jnp.float32(NEG)
    BIGc = jnp.float32(BIG)

    def take(flat, idx):
        return jnp.take(flat, idx, mode="clip")

    def chase(codes, tailM, tailX, tailY, stripeY, stripeX,
              O1b, O2b, C1f, C2f, R1f, R2f, parb, n1b, n2b, end_lob):
        """codes [G, DBv, 8, n1p] i32; tails [G, TCAP, 8, n1p] f32;
        stripes [G, 8, n1p] f32; O1b/O2b [B, op] i32; C1f/C2f [B, n1p|n2cap
        -> padded np, op] f32; R1f/R2f same shape i32; parb [B, 8] f32
        (ge, gi, sg, si, em, eg, es); n1b/n2b/end_lob [B] i32.
        Returns (m1 [B, Lm] i32, m2, meta [B, 16] f32)."""
        G, DBv, _, n1p = codes.shape
        n2p = stripeX.shape[2]           # boundary-X stripe is n2cap wide
        TCAP = tailM.shape[1]
        B, op = O1b.shape
        SHB = _shb(op)                   # code field widths follow op
        SMSK = (1 << SHB) - 1
        npad1 = C1f.shape[1]
        npad2 = C2f.shape[1]
        Lm = DBv + 8
        bidx = jnp.arange(B)
        gb = bidx // 8
        sb = bidx % 8
        ge, gi = parb[:, 0], parb[:, 1]
        si = parb[:, 3]
        em, eg, es = parb[:, 4], parb[:, 5], parb[:, 6]

        codesf = codes.reshape(-1)
        tailMf = tailM.reshape(-1)
        tailXf = tailX.reshape(-1)
        tailYf = tailY.reshape(-1)
        strYf = stripeY.reshape(-1)
        strXf = stripeX.reshape(-1)
        C1ff = C1f.reshape(-1)
        C2ff = C2f.reshape(-1)
        R1ff = R1f.reshape(-1)
        R2ff = R2f.reshape(-1)

        def code_at(y, x):
            d = y + x
            return take(codesf, ((gb * DBv + d) * 8 + sb) * n1p + y)

        def tail_at(flatP, yp, xp):
            """[..., extra] tail gather; yp/xp [B, ...]; invalid -> NEG."""
            ex = yp.shape[1:]
            gbe = gb.reshape((B,) + (1,) * len(ex))
            sbe = sb.reshape((B,) + (1,) * len(ex))
            lo = end_lob.reshape((B,) + (1,) * len(ex))
            t = yp + xp - lo
            ok = (t >= 0) & (t < TCAP) & ~((yp == 0) & (xp == 0))
            v = take(flatP, ((gbe * TCAP + jnp.clip(t, 0, TCAP - 1)) * 8
                             + sbe) * n1p + yp)
            return jnp.where(ok, v, NEGc)

        def stripe_at(flatP, pos, width):
            ex = pos.shape[1:]
            gbe = gb.reshape((B,) + (1,) * len(ex))
            sbe = sb.reshape((B,) + (1,) * len(ex))
            return take(flatP, (gbe * 8 + sbe) * width + pos)

        # ---- end transition (GraphAlign.h:304-353 / backtrack.py:75-108)
        # candidate order: slots in descending offset (= PredIterator
        # ascending-p) outer over g1, inner over g2, then [M, Y, X, skip]
        o1d = O1b[:, ::-1]                       # descending offsets
        o2d = O2b[:, ::-1]
        yend = (n1b - 1)[:, None]
        xend = (n2b - 1)[:, None]
        ypi = yend - o1d                         # [B, op]
        xpi = xend - o2d
        cyE = C1f[bidx, n1b - 1][:, ::-1]        # [B, op] desc-slot order
        cxE = C2f[bidx, n2b - 1][:, ::-1]
        yp2 = jnp.broadcast_to(ypi[:, :, None], (B, op, op))
        xp2 = jnp.broadcast_to(xpi[:, None, :], (B, op, op))
        okp = (yp2 >= 0) & (xp2 >= 0)
        ypc = jnp.maximum(yp2, 0)
        xpc = jnp.maximum(xp2, 0)
        Mv = tail_at(tailMf, ypc, xpc)
        Yv = tail_at(tailYf, ypc, xpc)
        Xv = tail_at(tailXf, ypc, xpc)
        cy2 = cyE[:, :, None]
        cx2 = cxE[:, None, :]
        emb = em[:, None, None]
        egb = eg[:, None, None]
        candM = ((Mv + emb) - cy2) - cx2
        candY = ((Yv + egb) - cy2) - cx2
        candX = ((Xv + egb) - cy2) - cx2
        both0 = (yp2 == 0) & (xp2 == 0)
        candS = jnp.where(both0, (es[:, None, None] - cy2) - cx2, -BIGc)
        valid = okp & (cy2 < COST_INF) & (cx2 < COST_INF)
        c4 = jnp.stack([candM, candY, candX, candS], axis=3)
        v4 = jnp.stack([valid, valid, valid, valid & both0], axis=3)
        c4m = jnp.where(v4, c4, -BIGc)
        Wend = c4m.reshape(B, -1).max(axis=1)
        diff = jnp.where(v4, jnp.abs(Wend[:, None, None, None] - c4), BIGc)
        k0 = jnp.argmin(diff.reshape(B, -1), axis=1).astype(i32)
        t0 = k0 % 4
        ab0 = k0 // 4
        a0 = ab0 // op                           # position in DESC order
        b0 = ab0 % op
        i0 = (op - 1) - a0                       # real slot index
        j0 = (op - 1) - b0
        pick2 = lambda A: A.reshape(B, -1)[bidx, ab0]
        y0 = jnp.maximum(pick2(yp2), 0)
        x0 = jnp.maximum(pick2(xp2), 0)
        st0 = jnp.where(t0 == 0, ST_M,
                        jnp.where(t0 == 1, ST_Y, ST_X)).astype(i32)
        # skip candidate wins -> origin (st unused)
        y0 = jnp.where(t0 == 3, 0, y0)
        x0 = jnp.where(t0 == 3, 0, x0)
        rep0y = take(R1ff, (bidx * npad1 + (n1b - 1)) * op + i0) > 0
        rep0x = take(R2ff, (bidx * npad2 + (n2b - 1)) * op + j0) > 0

        # ---- repeat-event buffers (markAlternativePath replays on host)
        eidx = jnp.arange(EV_CAP)

        def add_event(evs, evn, fail, side, nxt, cur, pos, cond):
            ov = cond & (evn >= EV_CAP)
            cond = cond & ~ov
            side_a, next_a, cur_a, pos_a = evs
            sel = cond[:, None] & (eidx[None, :] == evn[:, None])
            side_a = jnp.where(sel, side, side_a)
            next_a = jnp.where(sel, nxt[:, None], next_a)
            cur_a = jnp.where(sel, cur[:, None], cur_a)
            pos_a = jnp.where(sel, pos[:, None], pos_a)
            return ((side_a, next_a, cur_a, pos_a),
                    jnp.where(cond, evn + 1, evn), fail | ov)

        evs = tuple(jnp.zeros((B, EV_CAP), i32) for _ in range(4))
        evn = jnp.zeros(B, i32)
        fail0 = jnp.zeros(B, bool)

        lmax_ii = jnp.arange(Lm)
        map1 = jnp.full((B, Lm), -2, i32)
        map2 = jnp.full((B, Lm), -2, i32)

        def push(maps, pos, y, x, valid_):
            m1, m2 = maps
            sel = valid_[:, None] & (lmax_ii[None, :] == pos[:, None])
            m1 = jnp.where(sel, y[:, None], m1)
            m2 = jnp.where(sel, x[:, None], m2)
            return (m1, m2), jnp.where(valid_, pos + 1, pos)

        def push_state(maps, pos, y, x, st, valid_):
            e1_ = jnp.where(st == ST_X, -1, y)
            e2_ = jnp.where(st == ST_Y, -1, x)
            return push(maps, pos, e1_, e2_, valid_)

        maps, pos0 = push((map1, map2), jnp.zeros(B, i32),
                          n1b - 1, n2b - 1, jnp.ones(B, bool))
        # end-transition repeat events: host marks the y-side path first,
        # then the x-side, both BEFORE pushing (y0, x0) — record both at
        # pos0 (the cumulative-shift splice reproduces the order)
        evs, evn, fail0 = add_event(evs, evn, fail0, 1, y0, n1b - 1,
                                    pos0, rep0y)
        evs, evn, fail0 = add_event(evs, evn, fail0, 2, x0, n2b - 1,
                                    pos0, rep0x)
        live0 = (x0 != 0) | (y0 != 0)
        maps, pos1 = push_state(maps, pos0, y0, x0, st0, live0 & ~fail0)
        code0 = code_at(y0, x0)

        def bt_cond(s):
            y, x, st, code, pos, fail, it, maps_, evs_, evn_ = s
            return jnp.any(((y != 0) | (x != 0)) & (~fail)) & (it < Lm)

        def bt_body(s):
            y, x, st, code, pos, fail, it, maps_, evs_, evn_ = s
            act = ((y != 0) | (x != 0)) & (~fail)

            # interior decode straight from the fill's code word
            iM = (code >> SHB) & SMSK
            jM = code & SMSK
            rwY = (code >> (2 * SHB)) & 1
            iY = (code >> (2 * SHB + 1)) & SMSK
            rwX = (code >> (3 * SHB + 1)) & 1
            jX = (code >> (3 * SHB + 2)) & SMSK

            isY = st == ST_Y
            isX = st == ST_X
            on_bx = x == 0
            on_by = y == 0

            # Boundary replays (backtrack.py:140-172): the stored boundary
            # cells used start_gap but candidates use gap_init, so the
            # argmin is replayed explicitly from the exported stripes.
            # The replay is ~60% of the per-step instruction count yet a
            # walk only touches the boundaries near its tail, so both
            # blocks run under lax.cond gated on "any lane on a boundary
            # this step" — the hot interior iterations skip them entirely
            # (the untaken branch returns dummies that the interior
            # selects never read).
            need_b = jnp.any((act & isY & on_bx) | (act & isX & on_by))

            def boundary_replay(_):
                ypb = y[:, None] - O1b[:, ::-1]              # desc order
                okb = ypb >= 0
                sy = stripe_at(strYf, jnp.maximum(ypb, 0), n1p)
                yv = jnp.where(ypb == 0, NEGc, sy)
                wv = jnp.where(ypb == 0, si[:, None], sy)
                cyb = C1f[bidx, jnp.clip(y, 0, npad1 - 1)][:, ::-1]
                csY = stripe_at(strYf, y[:, None], n1p)[:, 0]
                d1 = jnp.abs(csY[:, None] - ((yv + ge[:, None]) - cyb))
                d2 = jnp.abs(csY[:, None] - ((wv + gi[:, None]) - cyb))
                candB = jnp.where(
                    okb[:, :, None] & (cyb < COST_INF)[:, :, None],
                    jnp.stack([d1, d2], 2), BIGc).reshape(B, -1)
                kB = jnp.argmin(candB, axis=1).astype(i32)

                xpb = x[:, None] - O2b[:, ::-1]
                okb2 = xpb >= 0
                sx = stripe_at(strXf, jnp.maximum(xpb, 0), n2p)
                xv = jnp.where(xpb == 0, NEGc, sx)
                wv2 = jnp.where(xpb == 0, si[:, None], sx)
                cxb = C2f[bidx, jnp.clip(x, 0, npad2 - 1)][:, ::-1]
                csX = stripe_at(strXf, x[:, None], n2p)[:, 0]
                e1 = jnp.abs(csX[:, None] - ((xv + ge[:, None]) - cxb))
                e2 = jnp.abs(csX[:, None] - ((wv2 + gi[:, None]) - cxb))
                candB2 = jnp.where(
                    okb2[:, :, None] & (cxb < COST_INF)[:, :, None],
                    jnp.stack([e1, e2], 2), BIGc).reshape(B, -1)
                kB2 = jnp.argmin(candB2, axis=1).astype(i32)
                return kB, kB2

            kB, kB2 = jax.lax.cond(
                need_b, boundary_replay,
                lambda _: (jnp.zeros(B, i32), jnp.zeros(B, i32)), 0)
            iB = (op - 1) - (kB // 2)
            rwB = kB % 2
            jB = (op - 1) - (kB2 // 2)
            rwB2 = kB2 % 2
            i_sel = jnp.where(isY, jnp.where(on_bx, iB, iY), iM)
            j_sel = jnp.where(isX, jnp.where(on_by, jB, jX), jM)
            rw = jnp.where(isY, jnp.where(on_bx, rwB, rwY),
                           jnp.where(isX, jnp.where(on_by, rwB2, rwX), 1))
            o1s = take(O1b.reshape(-1), bidx * op + i_sel)
            o2s = take(O2b.reshape(-1), bidx * op + j_sel)
            ny = jnp.where(isX, y, jnp.maximum(y - o1s, 0))
            nx = jnp.where(isY, x, jnp.maximum(x - o2s, 0))
            rep1 = jnp.where(isX, 0,
                             take(R1ff, (bidx * npad1
                                         + jnp.clip(y, 0, npad1 - 1)) * op
                                  + i_sel))
            rep2 = jnp.where(isY, 0,
                             take(R2ff, (bidx * npad2
                                         + jnp.clip(x, 0, npad2 - 1)) * op
                                  + j_sel))
            # record repeat events (host order: y-side mark, x-side mark,
            # then the push of (ny, nx)) at the pre-push position
            evs_, evn_, n_fail = add_event(evs_, evn_, fail, 1, ny, y,
                                           pos, act & (rep1 > 0))
            evs_, evn_, n_fail = add_event(evs_, evn_, n_fail, 2, nx, x,
                                           pos, act & (rep2 > 0))

            code2 = code_at(ny, nx)
            wst2 = (code2 >> (4 * SHB + 2)) & 3
            n_st = jnp.where(rw == 1, wst2,
                             jnp.where(isY, ST_Y, ST_X)).astype(i32)

            live = (ny != 0) | (nx != 0)
            maps_, pos = push_state(maps_, pos, ny, nx, n_st,
                                    act & live & ~n_fail)
            y = jnp.where(act, ny, y)
            x = jnp.where(act, nx, x)
            st = jnp.where(act, n_st, st)
            code = jnp.where(act, code2, code)
            return (y, x, st, code, pos, n_fail, it + 1, maps_, evs_,
                    evn_)

        (y_f, x_f, st_f, code_f, pos_f, fail_f, it_f, maps, evs,
         evn) = jax.lax.while_loop(bt_cond, bt_body,
                                   (y0, x0, st0, code0, pos1, fail0,
                                    i32(0), maps, evs, evn))
        # lanes still away from the origin at the iteration cap: chase
        # failure (should not happen; bails to host rather than looping)
        fail_f = fail_f | ((y_f != 0) | (x_f != 0))
        maps, posF = push(maps, pos_f, jnp.zeros(B, i32), jnp.zeros(B, i32),
                          ~fail_f)
        m1, m2 = maps
        meta = jnp.zeros((B, 16), jnp.float32)
        meta = meta.at[:, META_SCORE].set(Wend)
        meta = meta.at[:, META_LEN].set(posF.astype(jnp.float32))
        meta = meta.at[:, META_FAIL].set(fail_f.astype(jnp.float32))
        ev = jnp.concatenate([evn[:, None]] + list(evs), axis=1)
        return m1, m2, meta, ev

    return jax.jit(chase)


@functools.lru_cache(maxsize=4)
def _jit_pack():
    """Pack chase outputs into one int32 array: the batch costs ONE fetch
    (~25 ms fixed roundtrip on this tunnel)."""
    import jax
    import jax.numpy as jnp

    def pack(m1, m2, meta, ev):
        mi = jax.lax.bitcast_convert_type(meta, jnp.int32)
        return jnp.concatenate([m1, m2, mi, ev], axis=1)

    return jax.jit(pack)


# ---------------------------------------------------------------------------
# batch orchestration


class _DummyInfo:
    """Zero-cost group padding: a fake 2-node pair whose group runs ZERO
    diagonal blocks (the per-group loop bound is dynamic), so padding the
    group count to a power of two costs nothing.  Never harvested
    (idx = -1)."""

    class _NS:
        pass

    def __init__(self, like):
        dim = like.g1.dim
        self.idx = -1
        self.n1 = self.n2 = 2
        self.dfull = 2
        self.o1 = self.o2 = np.array([1], np.int32)
        self.C1 = self.C2 = np.array([[COST_INF], [0.0]], np.float32)
        self.rep1 = self.rep2 = np.zeros((2, 1), bool)
        self.scores = like.scores
        self.tier = like.tier
        g = self._NS()
        g.sites = np.zeros((2, dim), np.float64)
        g.dim = dim
        self.g1 = self.g2 = g
        m = self._NS()
        m.M = np.zeros((dim, dim), np.float64)
        m.pi = np.zeros(dim, np.float64)
        self.model = m


def _form_groups(infos, single=False):
    """Sort a tier's pairs by descending diagonal count and cut into groups
    of 8 whose diagonal spread fits the tail window; pad partial groups by
    repeating their smallest member (free: extra sublanes of work already
    paid) and the group count to a power of two with dummy zero-diagonal
    groups.  ``single``: one pair per group, replicated across all 8
    sublanes (the big repeat tiers)."""
    infos = sorted(infos, key=lambda p: -p.dfull)
    if single:
        groups = [[info] * 8 for info in infos]
    else:
        groups = []
        cur = []
        spread_cap = GROUP_SPREAD
        for info in infos:
            if cur and (len(cur) == 8
                        or cur[0].dfull - info.dfull > spread_cap):
                groups.append(cur)
                cur = []
            cur.append(info)
        if cur:
            groups.append(cur)
        for grp in groups:
            while len(grp) < 8:
                grp.append(grp[-1])
    dummy = _DummyInfo(groups[-1][-1])
    # pad the group count to a power of two (dummy groups run zero
    # diagonal blocks); for short-sequence classes also floor at 16 so the
    # kernel shape (and its one-time Mosaic compile) is reused across tree
    # levels — long-sequence and single-pair classes skip the floor (their
    # S prologue and plane memory scale with the padded batch)
    big = single or max(i.n1 for grp in groups for i in grp) > 512
    gcap = _pow2(len(groups)) if big else max(16, _pow2(len(groups)))
    while len(groups) < gcap:
        groups.append([dummy] * 8)
    return groups


def _launch_class(infos, tier, interpret, use_device_s, timers=None,
                  mesh=None):
    """Launch fill + chase for one tier class.  Returns (live_infos,
    packed_device_array, Lm).  With ``mesh``, the whole fill+chase+pack
    pipeline runs under ONE shard_map over the groups axis — a guide-tree
    level's pairs spread across every device of the mesh (SURVEY §2.5 DP
    row; the per-device kernel is the same Pallas program with a local
    group count)."""
    import jax
    import jax.numpy as jnp

    op, R = TIERS[tier]
    single = op >= SINGLE_OP
    groups = _form_groups(infos, single=single)
    ndev = mesh.size if mesh is not None else 1
    dummy = _DummyInfo(groups[-1][-1]) if len(groups) % ndev else None
    while len(groups) % ndev:
        groups.append([dummy] * 8)
    G = len(groups)
    B = G * 8
    flat = [info for grp in groups for info in grp]

    n1p = _lane_bucket(max(info.n1 for info in flat))
    n2cap = _lane_bucket(max(info.n2 for info in flat))
    DBv = _dbv_for(n1p, n2cap)

    # ---- host-side arrays (per-pair vector blocks are lane-padded to 128:
    # Mosaic's block-tiling rule rejects narrower VMEM blocks)
    scal = np.zeros((G, 8 + 2 * 8 * op), np.int32)
    scal[:, 8:] = 1                      # padded offset slots read as 1
    O1a = np.ones((B, 128), np.int32)
    O2a = np.ones((B, 128), np.int32)
    IVa = np.zeros((B, 128), np.int32)
    PARa = np.zeros((B, 128), np.float32)
    C1T = np.full((G, op, 8, n1p), COST_INF, np.float32)
    C2c = np.full((G, DBv, op, 128) if single else (G, DBv, 8, op),
                  COST_INF, np.float32)
    C1f = np.full((B, n1p, op), COST_INF, np.float32)
    C2f = np.full((B, n2cap, op), COST_INF, np.float32)
    R1f = np.zeros((B, n1p, op), np.int32)
    R2f = np.zeros((B, n2cap, op), np.int32)
    end_lob = np.zeros(B, np.int32)
    n1b = np.zeros(B, np.int32)
    n2b = np.zeros(B, np.int32)

    for gi_, grp in enumerate(groups):
        dmax = max(info.dfull for info in grp)
        dmin = min(info.dfull for info in grp)
        nblk = max(0, (dmax - 2 + 7) // 8)
        end_lo = max(0, ((dmin - R) // 8) * 8)
        assert 8 * nblk + 8 - end_lo <= _tcap(R), "tail window overflow"
        scal[gi_, 0] = nblk
        scal[gi_, 1] = end_lo
        scal[gi_, 2] = max(len(info.o1) for info in grp)
        scal[gi_, 3] = max(len(info.o2) for info in grp)
        for s, info in enumerate(grp):
            b = gi_ * 8 + s
            m1_, m2_ = len(info.o1), len(info.o2)
            O1a[b, :m1_] = info.o1
            O2a[b, :m2_] = info.o2
            scal[gi_, 8 + s * op:8 + s * op + m1_] = info.o1
            scal[gi_, 8 + 8 * op + s * op:8 + 8 * op + s * op + m2_] = \
                info.o2
            IVa[b, 0], IVa[b, 1] = info.n1, info.n2
            sc = info.scores
            PARa[b, :7] = (sc.gap_extend, sc.gap_init, sc.start_gap,
                           sc.start_init, sc.end_match, sc.end_gap,
                           sc.end_skip)
            C1T[gi_, :m1_, s, :info.n1] = info.C1.T
            if single:
                if s == 0:     # all sublanes carry the same pair
                    C2c[gi_, :info.n2, :m2_, 0] = info.C2
            else:
                C2c[gi_, :info.n2, s, :m2_] = info.C2
            C1f[b, :info.n1, :m1_] = info.C1
            C2f[b, :info.n2, :m2_] = info.C2
            R1f[b, :info.n1, :m1_] = info.rep1
            R2f[b, :info.n2, :m2_] = info.rep2
            end_lob[b] = end_lo
            n1b[b] = info.n1
            n2b[b] = info.n2

    # ---- S prologue
    if use_device_s and not interpret and os.environ.get(
            "PROGRAPHMSA_PALLAS_S", "1") == "1":
        Sdiag = _prologue_pallas(flat, n1p, n2cap, DBv, timers)
        if timers is not None:
            Sdiag.block_until_ready()
            timers("prologue")
    elif use_device_s:
        dim = flat[0].g1.dim
        g1s = np.zeros((B, n1p, dim), np.float32)
        g2s = np.zeros((B, n2cap, dim), np.float32)
        Mb = np.zeros((B, dim, dim), np.float32)
        pib = np.zeros((B, dim), np.float32)
        mib = np.zeros(B, np.float32)
        for b, info in enumerate(flat):
            g1s[b, :info.n1] = info.g1.sites.astype(np.float32)
            g2s[b, :info.n2] = info.g2.sites.astype(np.float32)
            Mb[b] = info.model.M.astype(np.float32)
            pib[b] = info.model.pi.astype(np.float32)
            mib[b] = np.float32(info.scores.match_init)
        Sdiag = _make_prologue(dim)(g1s, g2s, Mb, pib, mib, n1b, n2b)
        if timers is not None:
            Sdiag.block_until_ready()
            timers("prologue")
    else:
        Sdiag = jnp.asarray(_host_sdiag_group(groups, n1p, DBv))

    kern = _make_kernel(G // ndev, n1p, n2cap, DBv, op, R, interpret)
    chase = _make_chase()
    pack = _jit_pack()

    kern_args = (jnp.asarray(scal), jnp.asarray(O1a.reshape(G, 8, 128)),
                 jnp.asarray(O2a.reshape(G, 8, 128)),
                 jnp.asarray(IVa.reshape(G, 8, 128)),
                 jnp.asarray(PARa.reshape(G, 8, 128)), jnp.asarray(C1T),
                 Sdiag, jnp.asarray(C2c))
    chase_args = (jnp.asarray(O1a[:, :op].copy()),
                  jnp.asarray(O2a[:, :op].copy()),
                  jnp.asarray(C1f), jnp.asarray(C2f),
                  jnp.asarray(R1f), jnp.asarray(R2f),
                  jnp.asarray(PARa[:, :8].copy()),
                  jnp.asarray(n1b), jnp.asarray(n2b),
                  jnp.asarray(end_lob))

    if mesh is None:
        outs = kern(*kern_args)
        if timers is not None:
            outs[0].block_until_ready()
            timers("fill")
        m1, m2, meta, ev = chase(*outs, *chase_args)
        if timers is not None:
            meta.block_until_ready()
            timers("chase")
        packed = pack(m1, m2, meta, ev)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as PS

        from ..parallel.sharded import _shard_map

        multiproc = len({d.process_index
                         for d in mesh.devices.flat}) > 1

        def run(kargs, cargs):
            outs = kern(*kargs)
            m1, m2, meta, ev = chase(*outs, *cargs)
            p = pack(m1, m2, meta, ev)
            if multiproc:
                # every process needs the whole result (the harvest runs
                # host-side in each controller): one tiled all_gather
                p = jax.lax.all_gather(p, "pairs", axis=0, tiled=True)
            return p

        if multiproc:
            # multi-controller: inputs must be global arrays; the host
            # data is identical in every process, so replicate it
            repl = NamedSharding(mesh, PS())

            def g(a):
                a = np.asarray(a)
                return jax.make_array_from_callback(
                    a.shape, repl, lambda idx: a[idx])

            kern_args = tuple(g(a) for a in kern_args)
            chase_args = tuple(g(a) for a in chase_args)

        f = _shard_map(run, mesh,
                       (tuple(PS("pairs") for _ in kern_args),
                        tuple(PS("pairs") for _ in chase_args)),
                       PS() if multiproc else PS("pairs"))
        packed = f(kern_args, chase_args)
        if timers is not None:
            packed.block_until_ready()
            timers("fill+chase")
    Lm = DBv + 8
    return flat, packed, Lm


def _hbm_budget_ok(infos, tier):
    """Estimated device footprint of one class launch (codes + 3 tails +
    Sdiag + C2c + prologue sites/transients), vs a 4 GB cap.  Counts the
    full group-padded batch (ADVICE r3: the round-3 budget undercounted)."""
    op, R = TIERS[tier]
    single = op >= SINGLE_OP
    G = (_pow2(len(infos)) if single
         else _pow2((len(infos) + 7) // 8))
    n1p = _lane_bucket(max(i.n1 for i in infos))
    n2cap = _lane_bucket(max(i.n2 for i in infos))
    DBv = _dbv_for(n1p, n2cap)
    per_group = (DBv * 8 * n1p * 4             # codes
                 + 3 * _tcap(R) * 8 * n1p * 4  # tails
                 + DBv * 8 * n1p * 4           # Sdiag
                 + DBv * (op * 128 if single else 8 * op) * 4)   # C2c
    dim = infos[0].g1.dim
    per_group += 8 * (n1p + n2cap) * dim * 4 * 2   # prologue sites
    # the exact-S replay holds ~2 chunk-sweeps of full-S temporaries at a
    # time (~6 live S-sized buffers per pair, double-buffered — measured
    # from the XLA HBM dump at B=128/L=2048); those are freed before the
    # fill kernel runs, so the budget is the max of the two phases plus
    # the persistent arrays
    prologue_tmp = 2 * 6 * _prologue_chunk(n1p, n2cap, G * 8) \
        * n1p * n2cap * 4
    persistent = G * per_group
    return persistent + prologue_tmp <= 6e9


def align_pairs_device(items, interpret=None, s_mode="auto", mesh=None,
                       profile=None):
    """Fused device alignment of a BATCH of pairs: per-tier Pallas fill
    launches + XLA code-chases and ONE packed result fetch.  ``items``:
    list of (g1, g2, model, scores).  Returns a list of (mapping1,
    mapping2, score, n_tr_indels) — None per pair on bucket overflow or
    repeat-path bail (caller falls back to host).  ``mesh``: a 1-D
    ``pairs`` mesh — the level batch shards over its devices.
    ``profile``: a dict to fill with per-phase wall times (adds device
    syncs between stages — measurement only, leave None in production)."""
    import jax
    import jax.numpy as jnp
    import time as _time

    on_tpu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = not on_tpu
    use_device_s = (s_mode == "device") or (s_mode == "auto" and on_tpu)

    dbg = os.environ.get("PROGRAPHMSA_PALLAS_DEBUG", "0") == "1"
    t_mark = [_time.perf_counter()]

    def _mark(label):
        now = _time.perf_counter()
        if profile is not None:
            profile[label] = profile.get(label, 0.0) + (now - t_mark[0])
        if dbg:
            print("pallas-batch %-10s %.3f s" % (label, now - t_mark[0]),
                  flush=True)
        t_mark[0] = now

    results = [None] * len(items)
    _fallback_stats["pairs_total"] += len(items)
    tiers = {}
    for idx, (g1, g2, model, scores) in enumerate(items):
        info = _prep_pair(idx, g1, g2, model, scores)
        if isinstance(info, str):
            _fallback_stats[info] += 1
            continue
        tiers.setdefault(info.tier, []).append(info)
    _mark("prep")

    launches = []
    for tier, infos in sorted(tiers.items()):
        # chunk a class when its HBM footprint would exceed the budget:
        # recursive halving down to single pairs (ADVICE r4 — halving just
        # once dropped whole still-splittable halves to the host)
        stack = [list(infos)]
        while stack:
            chunk = stack.pop()
            if _hbm_budget_ok(chunk, tier):
                launches.append((tier, chunk))
            elif len(chunk) > 1:
                half = len(chunk) // 2
                stack.append(chunk[half:])
                stack.append(chunk[:half])
            else:
                # a single pair too big (enormous sequences): host fallback
                _fallback_stats["fb_size"] += 1

    outs = []
    timers = _mark if (dbg or profile is not None) else None
    for tier, infos in launches:
        flat, packed, Lm = _launch_class(infos, tier, interpret,
                                         use_device_s, timers, mesh=mesh)
        outs.append((flat, np.asarray(packed), Lm))   # fetch
    _mark("fetch")

    from .backtrack import mark_alternative_path

    for flat, packed, Lm in outs:
        seen = set()
        meta_lo = 2 * Lm
        ev_lo = meta_lo + 16
        metah = packed[:, meta_lo:ev_lo].view(np.float32)
        for k, info in enumerate(flat):
            if info.idx < 0 or info.idx in seen:
                continue
            seen.add(info.idx)
            if metah[k, META_FAIL] != 0.0:
                _fallback_stats["fb_rep"] += 1
                continue
            ln = int(metah[k, META_LEN])
            ntr = int(packed[k, ev_lo])
            if ntr == 0:
                results[info.idx] = (
                    packed[k, :Lm][:ln][::-1].tolist(),
                    packed[k, Lm:2 * Lm][:ln][::-1].tolist(),
                    np.float32(metah[k, META_SCORE]), 0)
            else:
                # splice the host markAlternativePath columns into the
                # walk-order mapping at the recorded positions (the host
                # appends them at exactly these points of its own walk)
                walk1 = packed[k, :Lm][:ln].tolist()
                walk2 = packed[k, Lm:2 * Lm][:ln].tolist()
                evb = packed[k, ev_lo + 1:ev_lo + 1 + 4 * EV_CAP]
                sides = evb[:EV_CAP]
                nxts = evb[EV_CAP:2 * EV_CAP]
                curs = evb[2 * EV_CAP:3 * EV_CAP]
                poss = evb[3 * EV_CAP:4 * EV_CAP]
                shift = 0
                for t in range(ntr):
                    tmp_m, tmp_o = [], []
                    if sides[t] == 1:
                        mark_alternative_path(int(nxts[t]), int(curs[t]),
                                              info.g1, tmp_m, tmp_o)
                        at = int(poss[t]) + shift
                        walk1[at:at] = tmp_m
                        walk2[at:at] = tmp_o
                    else:
                        mark_alternative_path(int(nxts[t]), int(curs[t]),
                                              info.g2, tmp_m, tmp_o)
                        at = int(poss[t]) + shift
                        walk2[at:at] = tmp_m
                        walk1[at:at] = tmp_o
                    shift += len(tmp_m)
                results[info.idx] = (walk1[::-1], walk2[::-1],
                                     np.float32(metah[k, META_SCORE]), ntr)
            _fallback_stats["pairs_device"] += 1
    return results


def align_pair_device(g1, g2, model, scores, interpret=None, s_mode="auto"):
    """Fused device alignment of one pair (batch of 1)."""
    return align_pairs_device([(g1, g2, model, scores)], interpret,
                              s_mode)[0]
