"""Device-exact match-score matrix (bitwise == host precompute_scores).

The S-matrix pipeline (/root/reference/src/GraphAlign.h:146-163) is the
"natural MXU kernel" of SURVEY §2 — but byte-identical alignments require
replaying the reference's *rounding*, not just its math.  The TPU's f32
mul/add round exactly like the host (no FMA contraction — probed), so the
Eigen gebp rank-1 accumulation and the SSE packet dot can be replayed
op-for-op on the VPU; the two divisions (S = num/den and the fast-log's
b/(d-c), ls_log.h:7-19) use ``exact_math.exact_div`` because the TPU's
hardware divide is approximate.  Result: S from this module is bitwise
identical to ``align.scores.precompute_scores`` (tests/test_scores_device.py),
so the device DP + device backtrack reproduce the reference's alignments
byte-for-byte with *no* per-pair S upload — only the DIM-wide site profiles
travel to the device.
"""

from __future__ import annotations

import functools

import numpy as np

from .scores import _LS_A, _LS_B, _LS_C


def _ls_log_add_matrix(jnp, lax, S_raw, add, n1):
    """Elementwise ls_log(x) + add with the host's column-major vector/tail
    split (align/scores.py ls_log_add): elements at column-major position
    >= (n1*n2) & ~3 use the scalar-tail op order."""
    from .exact_math import exact_div

    f32 = jnp.float32
    bits = lax.bitcast_convert_type(S_raw, jnp.uint32)
    e = (bits >> jnp.uint32(23)).astype(jnp.int32) - jnp.int32(126)
    ef = e.astype(f32)
    mant = ((bits << jnp.uint32(9)) >> jnp.uint32(9)) ^ jnp.uint32(0x3F000000)
    d = lax.bitcast_convert_type(mant, f32)

    q = exact_div(jnp.full_like(d, _LS_B), d - _LS_C)

    body = (q + add) + (ef + _LS_A)
    tail = ((_LS_A + q) + ef) + add

    n1p, n2p = S_raw.shape
    ys = jnp.arange(n1p, dtype=jnp.int32)[:, None]
    xs = jnp.arange(n2p, dtype=jnp.int32)[None, :]
    pos_cm = ys + xs * n1                       # column-major flat position
    # alen is derived from the real sizes at trace time by the caller
    return body, tail, pos_cm


def make_exact_S(dim: int):
    """Build the jittable exact-S function for one alphabet DIM."""
    import jax
    import jax.numpy as jnp
    import jax.lax as lax
    from .exact_math import exact_div

    f32 = jnp.float32
    k4 = dim & ~3

    def fmul(a, b):
        # explicitly rounded product: XLA:CPU would otherwise contract the
        # mul into the following add (FMA), skipping the intermediate
        # rounding this replay must reproduce; XLA:TPU never contracts
        return lax.optimization_barrier(a * b)

    def eigen_dot(A, y):
        """Row-wise f32 dot with Eigen/SSE packet rounding
        (align/scores.py _eigen_dot_f32)."""
        n = A.shape[0]
        acc = jnp.zeros((n, 4), f32)
        for k in range(0, k4, 4):
            acc = acc + fmul(A[:, k:k + 4], y[k:k + 4][None, :])
        res = (acc[:, 0] + acc[:, 2]) + (acc[:, 1] + acc[:, 3])
        for k in range(k4, dim):
            res = res + fmul(A[:, k], y[k])
        return res

    def exact_S(g1s, g2s, M, pi, match_init, n1, n2):
        """S [n1p, n2p] f32, bitwise == host precompute_scores on the real
        (n1, n2) region.  g1s [n1p, dim], g2s [n2p, dim] f32 (zero-padded
        rows behave like sentinel columns).  n1, n2 traced int32."""
        # Eigen gebp replay: t2 = (M^T g2)^T via rank-1 accumulation, then
        # num via rank-1 over dim — each step rounds like the host
        t2 = jnp.zeros((g2s.shape[0], dim), f32)
        for b in range(dim):
            t2 = t2 + fmul(g2s[:, b][:, None], M[b][None, :])
        num = jnp.zeros((g1s.shape[0], g2s.shape[0]), f32)
        for dd in range(dim):
            num = num + fmul(g1s[:, dd][:, None], t2[:, dd][None, :])

        v1 = eigen_dot(g1s, pi)
        v2 = eigen_dot(g2s, pi)
        den = fmul(v1[:, None], v2[None, :])
        S_raw = exact_div(num, den)

        body, tail, pos_cm = _ls_log_add_matrix(jnp, lax, S_raw,
                                                f32(match_init), n1)
        alen = (n1 * n2) & ~jnp.int32(3)
        return jnp.where(pos_cm < alen, body, tail)

    return exact_S


@functools.lru_cache(maxsize=8)
def _jitted(dim: int):
    import jax
    return jax.jit(make_exact_S(dim))


def exact_S_device(g1_sites: np.ndarray, g2_sites: np.ndarray, model,
                   match_init) -> np.ndarray:
    """Convenience host-in/host-out wrapper (testing; production keeps the
    result on device)."""
    fn = _jitted(model.M.shape[0])
    out = fn(g1_sites.astype(np.float32), g2_sites.astype(np.float32),
             model.M.astype(np.float32), model.pi.astype(np.float32),
             np.float32(match_init), g1_sites.shape[0], g2_sites.shape[0])
    return np.asarray(out)
