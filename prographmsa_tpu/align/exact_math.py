"""Correctly-rounded float32 primitives for device-exact score replay.

The TPU's f32 multiply and add round identically to the host (verified by
probe: separate mul/add, no FMA contraction under XLA), but its f32 *divide*
is approximate — while the reference's S-matrix pipeline
(/root/reference/src/GraphAlign.h:146-163 and the ls_log fast-log2,
ls_log.h:7-19) divides twice per element.  f64 emulation is unavailable on
this backend (hangs the axon worker).  ``exact_div`` therefore reconstructs
the correctly-rounded IEEE quotient from exact-rounding ops only:

  1. seed q0 = x/y (hardware, within a few ulp),
  2. one Newton step with an exact residual via Veltkamp splitting /
     Dekker's 2Prod (error-free f32 product as a hi+err pair),
  3. candidate selection among {q1-ulp, q1, q1+ulp} by exact residual
     comparison (2Diff error-free subtraction for the final compare).

Ties cannot occur: a p-bit/p-bit quotient is never exactly at a rounding
midpoint (the midpoint's (p+1)-bit odd mantissa times the divisor cannot fit
in p bits), so argmin|residual| is the correctly-rounded result.

Domain: x >= 0, y >= 0, finite or zero, normal quotients (the S pipeline's
probabilities are ~[1e-30, 1e3]).  x==0 -> 0, y==0 -> inf/NaN to match host
numpy semantics bitwise.
"""

from __future__ import annotations

import numpy as np

_SPLIT = np.float32(4097.0)           # 2**12 + 1 (Veltkamp for p=24)
_NAN_BITS = np.uint32(0xFFC00000)     # numpy x86 0/0 quiet-NaN (sign set);
                                      # ls_log consumes these raw bits, so
                                      # the exact pattern is parity-relevant


def _mk(jnp, barrier: bool = True):
    """Build the jnp implementation once (shared by jit traces).

    ``barrier=False`` drops the optimization barriers around products —
    required inside Pallas TPU kernels (Mosaic does not lower
    optimization_barrier, and it also never FMA-contracts, so the barrier
    is unnecessary there; bitwise parity is asserted on-chip by
    tests/test_scores_pallas.py)."""
    f32 = jnp.float32

    def fmul(a, b):
        # An explicitly ROUNDED f32 product: XLA:CPU contracts mul+add
        # into FMA (skipping the intermediate rounding this algorithm
        # depends on); the barrier pins the product as a rounded value.
        # XLA:TPU never contracts (probed), so this is free there.
        if not barrier:
            return a * b
        return jax_lax.optimization_barrier(a * b)

    def split(a):
        c = fmul(a, _SPLIT)
        hi = c - (c - a)
        return hi, a - hi

    def prod_err(a, b, p):
        """err such that a*b == p + err exactly (Dekker 2Prod)."""
        ah, al = split(a)
        bh, bl = split(b)
        return ((fmul(ah, bh) - p) + fmul(ah, bl)
                + fmul(al, bh)) + fmul(al, bl)

    def two_diff(a, b):
        """(s, e): a - b == s + e exactly."""
        s = a - b
        bb = a - s
        e = bb - b
        return s, e

    def exact_div(x, y):
        x = x.astype(f32)
        y = y.astype(f32)
        q0 = x / y                        # hardware seed, few-ulp accurate
        # Veltkamp split overflows for |operand| >~ 2^116/4097; rescale the
        # (quotient, divisor) pair by an exact power of two so both stay
        # moderate.  c*s and y/s are exact, and (c*s)*(y/s) rounds exactly
        # like c*y, so the error term is unchanged.
        s = jnp.where(q0 >= f32(2.0) ** 32, f32(2.0) ** -32,
                      jnp.where((q0 > 0) & (q0 <= f32(2.0) ** -32),
                                f32(2.0) ** 32, f32(1.0)))
        ys = y / s

        def resid(c):
            pc = fmul(c, y)
            ec = prod_err(fmul(c, s), ys, pc)
            hi = x - pc                  # exact (Sterbenz)
            sd, e = two_diff(hi, ec)     # exact pair for the compare
            return sd, e

        # Newton with exact residual: r0 = x - q0*y
        r0, r0e = resid(q0)
        q1 = q0 + fmul(r0 + r0e, f32(1.0) / y)

        bits = jnp.where(q1 > 0, q1, f32(1.0))  # guard bitcast domain
        b = jax_lax.bitcast_convert_type(bits, jnp.uint32)
        qm = jax_lax.bitcast_convert_type(b - jnp.uint32(1), f32)
        qp = jax_lax.bitcast_convert_type(b + jnp.uint32(1), f32)

        s1, e1a = resid(q1)
        sm, ema = resid(qm)
        sp, epa = resid(qp)

        def absless(sa, ea, sb, eb):
            """|sa+ea| < |sb+eb| exactly (|e| << ulp(s))."""
            aa, ab = jnp.abs(sa), jnp.abs(sb)
            # sign-adjust the error terms into the magnitude
            ea_ = jnp.where(sa < 0, -ea, ea)
            eb_ = jnp.where(sb < 0, -eb, eb)
            return (aa < ab) | ((aa == ab) & (ea_ < eb_))

        best = q1
        best_s, best_e = s1, e1a
        take_m = absless(sm, ema, best_s, best_e)
        best = jnp.where(take_m, qm, best)
        best_s = jnp.where(take_m, sm, best_s)
        best_e = jnp.where(take_m, ema, best_e)
        take_p = absless(sp, epa, best_s, best_e)
        best = jnp.where(take_p, qp, best)

        # specials, matching host numpy bitwise
        nan = jax_lax.bitcast_convert_type(
            jnp.full(x.shape, _NAN_BITS, jnp.uint32), f32)
        out = jnp.where(y == 0,
                        jnp.where(x == 0, nan, f32(np.inf)),
                        jnp.where(x == 0, f32(0.0), best))
        return out

    return exact_div


_jnp_impl = None
jax_lax = None


def exact_div(x, y):
    """Correctly-rounded f32 x/y on the current JAX backend."""
    global _jnp_impl, jax_lax
    if _jnp_impl is None:
        import jax.numpy as jnp
        import jax.lax as lax
        jax_lax = lax
        _jnp_impl = _mk(jnp)
    return _jnp_impl(x, y)


def exact_div_fn(barrier: bool = True):
    """The jnp exact-div callable itself — for embedding in Pallas TPU
    kernels, which need ``barrier=False`` (Mosaic neither lowers
    optimization_barrier nor FMA-contracts)."""
    global jax_lax
    if jax_lax is None:
        import jax.lax as lax
        jax_lax = lax
    import jax.numpy as jnp
    return _mk(jnp, barrier)


# ---------------------------------------------------------------------------
# host-numpy mirror with an adjustable seed error, for property testing the
# candidate-selection logic without TPU hardware (host division is already
# correctly rounded, so the seed must be artificially perturbed)
# ---------------------------------------------------------------------------

def exact_div_host(x, y, seed_ulp_offset=None):
    f32 = np.float32
    x = x.astype(f32)
    y = y.astype(f32)

    def split(a):
        c = (a * _SPLIT).astype(f32)
        hi = (c - (c - a).astype(f32)).astype(f32)
        return hi, (a - hi).astype(f32)

    def prod_err(a, b, p):
        ah, al = split(a)
        bh, bl = split(b)
        return ((((ah * bh).astype(f32) - p).astype(f32)
                 + (ah * bl).astype(f32)).astype(f32)
                + (al * bh).astype(f32)).astype(f32) + (al * bl).astype(f32)

    def two_diff(a, b):
        s = (a - b).astype(f32)
        bb = (a - s).astype(f32)
        e = (bb - b).astype(f32)
        return s, e

    with np.errstate(divide="ignore", invalid="ignore", over="ignore",
                     under="ignore"):
        q0 = (x / y).astype(f32)
        if seed_ulp_offset is not None:
            bz = q0.copy().view(np.uint32)
            ok = (q0 > 0) & np.isfinite(q0)
            bz[ok] = (bz[ok].astype(np.int64)
                      + seed_ulp_offset[ok]).astype(np.uint32)
            q0 = bz.view(f32)
        s = np.where(q0 >= f32(2.0) ** 32, f32(2.0) ** -32,
                     np.where((q0 > 0) & (q0 <= f32(2.0) ** -32),
                              f32(2.0) ** 32, f32(1.0))).astype(f32)
        ys = (y / s).astype(f32)

        def resid(c):
            pc = (c * y).astype(f32)
            ec = prod_err((c * s).astype(f32), ys, pc)
            hi = (x - pc).astype(f32)
            return two_diff(hi, ec)

        r0, r0e = resid(q0)
        q1 = (q0 + ((r0 + r0e).astype(f32)
                    * (f32(1.0) / y).astype(f32)).astype(f32)).astype(f32)

        bits = np.where(q1 > 0, q1, f32(1.0)).astype(f32).view(np.uint32)
        qm = (bits - np.uint32(1)).view(f32)
        qp = (bits + np.uint32(1)).view(f32)

        s1, e1a = resid(q1)
        sm, ema = resid(qm)
        sp, epa = resid(qp)

        def absless(sa, ea, sb, eb):
            aa, ab = np.abs(sa), np.abs(sb)
            ea_ = np.where(sa < 0, -ea, ea)
            eb_ = np.where(sb < 0, -eb, eb)
            return (aa < ab) | ((aa == ab) & (ea_ < eb_))

        best = q1.copy()
        best_s, best_e = s1, e1a
        take_m = absless(sm, ema, best_s, best_e)
        best = np.where(take_m, qm, best)
        best_s = np.where(take_m, sm, best_s)
        best_e = np.where(take_m, ema, best_e)
        take_p = absless(sp, epa, best_s, best_e)
        best = np.where(take_p, qp, best)

        nan = np.full(x.shape, _NAN_BITS, np.uint32).view(f32)
        out = np.where(y == 0, np.where(x == 0, nan, f32(np.inf)),
                       np.where(x == 0, f32(0.0), best)).astype(f32)
    return out
