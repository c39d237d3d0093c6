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
import os


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


NW_DEVICE_RATE = 550e6       # device-resident NW fill+backtrack cells/s
NW_NATIVE_RATE = 240e6       # native NW cells/s PER CORE (-march=native)
FETCH_COMPRESS = 4.0         # tunnel fetches compress sparse count arrays
                             # ~4x vs the random-data fetch_mbps probe


def _host_threads() -> int:
    from . import native
    return native.n_threads()


def use_device_nw(options, n_pairs: int = 0, L: int = 0,
                  dim: int = 20) -> bool:
    """All-pairs NW distances on device?  Under ``auto`` the call is routed
    by a cost model over the probed calibration: device cost = resident
    fill rate + per-chunk dispatch roundtrips + the counts fetch; native
    cost = cells over the threaded host rate.  On the axon tunnel
    (roundtrip ~25 ms, fetch ~15 MB/s) mid-sized batches route native; on
    a directly-attached host the same formula routes device.  Unknown
    workload (n_pairs=0) keeps the device default."""
    eng = getattr(options, "engine", "auto")
    if eng in ("device", "pallas"):
        return True
    if eng in ("native", "numpy"):
        return False
    if not on_tpu():
        return False
    if not n_pairs:
        return True
    c = calibration()
    cells = float(n_pairs) * L * L
    nchunks = max(1, (n_pairs + 2047) // 2048)
    fetch_mb = n_pairs * (dim * dim * 8.0 + 4.0) / 1e6
    dev = (cells / NW_DEVICE_RATE + nchunks * 4.0 * c["roundtrip_s"]
           + fetch_mb / (c["fetch_mbps"] * FETCH_COMPRESS))
    nat = cells / (NW_NATIVE_RATE * _host_threads())
    return dev < nat


def use_device_angle(options) -> bool:
    """Angle (k-mer) distances via the MXU Gram?  Only under the explicit
    device engines: the Gram itself is exact for the fixture-scale counts,
    but the host f64 path replays Eigen's accumulation order and its
    rounding decides NJ tie-breaks — measured divergence is ~1e-15 with
    identical trees on the golden corpus (BASELINE.md), yet ``auto``
    keeps the bit-parity guarantee."""
    return getattr(options, "engine", "auto") in ("device", "pallas")


def use_device_prealigned(options, n_pairs: int = 0, L: int = 0,
                          count_bound: int = 20) -> bool:
    """Prealigned pair statistics on device?  The counts GEMM is exact
    (0/1 bf16 operands, f32 accumulate) and gap openings are an int scan,
    so unlike the f64 stages this one loses no rounding parity.  Under
    ``auto`` the same probed cost model as NW applies: the vectorized host
    batch scan (one bincount over all pairs) costs ~30 vector ops per
    column, and the device pays the roundtrips plus the counts fetch —
    which on the tunnel outweighs the host scan for fixture-scale inputs,
    while a direct-attached host routes device."""
    eng = getattr(options, "engine", "auto")
    if eng in ("device", "pallas"):
        return True
    if eng in ("native", "numpy"):
        return False
    if not on_tpu():
        return False
    if not n_pairs:
        return True
    c = calibration()
    fetch_mb = n_pairs * (count_bound * count_bound * 2.0 + 8.0) / 1e6
    dev = (4.0 * c["roundtrip_s"]
           + fetch_mb / (c["fetch_mbps"] * FETCH_COMPRESS)
           + float(n_pairs) * L / 2e9)
    host = float(n_pairs) * L * 30.0 / 1e9
    return dev < host


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


NATIVE_CELLS_PER_SEC = 120e6     # measured host C++ graph-DP fill rate


@functools.lru_cache(maxsize=1)
def calibration() -> dict:
    """One-shot probed host<->device constants, persisted next to the JAX
    compilation cache so later processes skip the probe (VERDICT r3 #8:
    policy thresholds must derive from measurement, not constants tuned to
    one tunnel).  ``roundtrip_s`` is the dispatch+sync latency of a tiny
    jitted op — ~25 ms on the axon tunnel, ~0.2 ms on a directly attached
    TPU host — which is the dominant fixed cost of a device launch."""
    import json
    import pathlib
    import time

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    path = (pathlib.Path(cache_dir) / "pallas_calib.json"
            if cache_dir else None)
    persisted = None
    if path is not None and path.exists():
        try:
            got = json.loads(path.read_text())
            if (1e-5 <= got.get("roundtrip_s", 0) <= 0.5
                    and 1.0 <= got.get("fetch_mbps", 0) <= 1e5):
                persisted = got
        except Exception:  # noqa: BLE001 — stale/corrupt: reprobe
            pass
    if persisted is not None:
        # guard against a persisted bad probe (VERDICT r4 #10): one cheap
        # spot-check of the roundtrip; a >3x disagreement triggers a full
        # re-probe instead of trusting the stale numbers forever
        spot = _probe_roundtrip(reps=2)
        if spot is None:
            return persisted
        ratio = spot / max(1e-6, persisted["roundtrip_s"])
        if 1.0 / 3.0 <= ratio <= 3.0:
            return persisted
    calib = dict(_probe_all())
    if path is not None:
        try:
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_text(json.dumps(calib))
        except OSError:
            pass
    return calib


def _probe_roundtrip(reps: int = 5):
    """min of ``reps`` dispatch+sync roundtrips, or None without a
    backend."""
    import time

    try:
        import jax
        import jax.numpy as jnp
        f = jax.jit(lambda a: a + 1)
        x = jnp.zeros((8, 128), jnp.float32)
        f(x).block_until_ready()        # compile outside the timing
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            f(x).block_until_ready()
            times.append(time.perf_counter() - t0)
        return max(1e-4, min(times))
    except Exception:  # noqa: BLE001 — no backend
        return None


def _probe_all() -> dict:
    """Full calibration probe: roundtrip (min of 5) and fetch bandwidth
    (MEDIAN of 5 one-MB random fetches — a single unlucky probe on a
    20-50%-noise tunnel would otherwise mis-tune the policy for every
    later process; VERDICT r4 #10)."""
    import time

    calib = {"roundtrip_s": 0.025, "fetch_mbps": 15.0}   # tunnel defaults
    try:
        import numpy as _np
        import jax
        import jax.numpy as jnp
        rt = _probe_roundtrip(reps=5)
        if rt is not None:
            calib["roundtrip_s"] = rt
        # device->host bandwidth (1 MB of random data — constant arrays
        # compress on the tunnel and overstate it)
        y = jnp.asarray(_np.random.default_rng(0)
                        .random(262144, dtype=_np.float32))
        (y + 1).block_until_ready()
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _np.asarray(y + 1)
            times.append(max(1e-5, time.perf_counter() - t0))
        med = sorted(times)[len(times) // 2]
        calib["fetch_mbps"] = float(_np.clip(round(1.0 / med, 1), 1.0, 1e5))
        calib["backend"] = jax.default_backend()
    except Exception:  # noqa: BLE001 — no backend: host tiers anyway
        pass
    return calib


def pallas_cells_threshold() -> float:
    """Minimum level-batch cell count where the device graph-DP launch can
    beat the native host fill: the batch pays ~6 roundtrips plus a ~1 MB
    packed-mapping fetch of fixed cost, so the native time must exceed
    twice that before the device is worth it."""
    c = calibration()
    fixed = 6.0 * c["roundtrip_s"] + 1.0 / max(1.0, c["fetch_mbps"])
    return max(250_000.0, NATIVE_CELLS_PER_SEC * fixed * 2.0)


def use_pallas_dp(options, level_cells: int = 0) -> bool:
    """Graph-pair DP on the fused Pallas kernel?  In auto mode only on TPU
    and only when the level batch is big enough that the probed fixed
    launch cost is amortized (see ``pallas_cells_threshold``)."""
    eng = getattr(options, "engine", "auto")
    if eng == "pallas":
        return True
    if eng in ("native", "numpy", "device"):
        return False
    return on_tpu() and level_cells >= pallas_cells_threshold()
