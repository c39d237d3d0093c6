"""Engine selection policy: which kernel tier runs each stage.

The framework has three executors per stage (SURVEY §7): the device tier
(JAX/XLA/Pallas on the TPU), the native host tier (C++ via ctypes), and the
numpy parity tier.  ``Options.engine`` picks:

  auto    device kernels on TPU backends where they win, native otherwise
  pallas  force the fused device graph-DP + device NW
  device  force the per-pair XLA graph-DP + device NW (legacy/debug)
  native  force the C++ host tier
  numpy   force the numpy parity tier

Hardware facts this policy encodes (probed on the axon-tunneled v5e; see
BASELINE.md):
  * a fresh device->host fetch costs ~25 ms regardless of size, so device
    stages only win when batched into few launches/fetches (all-pairs NW:
    one fetch per 2048-pair chunk; graph-DP: one fetch per tree level);
  * float64 is unavailable (the f64 emulation path hangs the runtime), so
    the f64-exact stages (ML Newton, angle cosine transform, CS profiles,
    BioNJ) stay on host — they are double-precision in the reference
    (DistanceFactoryML.h, DistanceFactoryAngle.h, CSProfile.cpp) and their
    rounding decides guide-tree tie-breaks.
"""

from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def device_backend() -> str:
    """The JAX backend name, or "" when JAX is unusable.  Cached: touching
    the backend initializes the TPU client, which serializes against other
    TPU processes on this host."""
    try:
        import jax
        return jax.default_backend()
    except Exception:  # noqa: BLE001 — any init failure means host tiers
        return ""


def on_tpu() -> bool:
    return device_backend() == "tpu"


def use_device_nw(options) -> bool:
    """All-pairs NW distances on device?  One fused fill+backtrack launch
    per 2048-pair chunk (distances/nw_device.py), measured at 275 M cells/s
    vs the reference binary's 138 M upper bound on this chip."""
    eng = getattr(options, "engine", "auto")
    if eng in ("device", "pallas"):
        return True
    if eng in ("native", "numpy"):
        return False
    return on_tpu()


def use_device_prealigned(options) -> bool:
    """Prealigned pair statistics on device?  The counts GEMM is exact
    (0/1 bf16 operands, f32 accumulate) and gap openings are an int scan,
    so unlike the f64 stages this one loses no rounding parity; one ~MB
    fetch replaces the O(N² L) host pair loop."""
    eng = getattr(options, "engine", "auto")
    if eng in ("device", "pallas"):
        return True
    if eng in ("native", "numpy"):
        return False
    return on_tpu()


@functools.lru_cache(maxsize=1)
def level_mesh():
    """Mesh for sharding a tree level's pair batch across every visible
    device (align/graph_dp_pallas.py mesh path); None on a single device
    (shard_map overhead buys nothing there)."""
    try:
        import jax
        if len(jax.devices()) < 2:
            return None
        from .parallel.mesh import make_mesh
        return make_mesh(len(jax.devices()))
    except Exception:  # noqa: BLE001 — no usable backend: single-device
        return None


def use_pallas_dp(options, level_cells: int = 0) -> bool:
    """Graph-pair DP on the fused Pallas kernel?  In auto mode only on TPU
    and only when a level batch is big enough that one ~25 ms fetch beats
    the native fill of the whole level (~125 M cells/s host)."""
    eng = getattr(options, "engine", "auto")
    if eng == "pallas":
        return True
    if eng in ("native", "numpy", "device"):
        return False
    return on_tpu() and level_cells >= 4_000_000
