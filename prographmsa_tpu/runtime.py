"""Process-level device runtime knobs.

One stop for the JAX settings every entry point (CLI, bench, graft entry)
wants:

* a **persistent XLA compilation cache** — TPU compiles of the NW / DP /
  pair-stats kernels cost seconds each; caching them on disk makes every
  run after the first start warm (the reference binary has no compile
  phase at all, so this is table stakes for honest wall-clock parity);
* nothing else — precision/backend policy lives in ``engine_policy``.

The cache directory defaults to ``<package parent>/.jax_cache`` (gitignored)
and can be moved with ``PROGRAPHMSA_XLA_CACHE``.
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def enable_compile_cache() -> str:
    """Idempotently point JAX at the persistent compilation cache.

    Safe to call before or after other jax imports; returns the cache dir
    (or "" if jax is unusable here).
    """
    cache = os.environ.get(
        "PROGRAPHMSA_XLA_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        # cache even fast compiles: the tunnel makes every recompile count
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — no jax, nothing to cache
        return ""
    return cache
