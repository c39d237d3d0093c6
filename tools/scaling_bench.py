#!/usr/bin/env python
"""Weak-scaling of the sharded all-pairs NW kernel on a virtual CPU mesh.

Runs B = PAIRS_PER_DEV * n pairs over n in {1, 2, 4, 8} fake CPU devices
(one process, XLA host-platform device count) and reports wall time and
weak-scaling efficiency t(1)/t(n).

Caveat (stated in BASELINE.md): virtual CPU devices share the same physical
cores, so this measures the *partitioning + collective overhead* of the
shard_map program, not real multi-chip speedup; real ICI scaling needs a
pod slice.  Run:  python tools/scaling_bench.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAIRS_PER_DEV = 96
L = 128


def run_one(n: int) -> float:
    """Executed in a child process (device count is fixed at backend init)."""
    sys.path.insert(0, REPO)
    import numpy as np
    import jax

    if len(jax.devices()) < n:
        # the axon sitecustomize pins the platform before XLA_FLAGS is
        # honored; rebuild the CPU client with a virtual device count
        # (same workaround as __graft_entry__.dryrun_multichip)
        jax.config.update("jax_platforms", "cpu")
        if len(jax.devices()) < n:
            from jax._src import xla_bridge
            xla_bridge._clear_backends()
            jax.clear_caches()
            jax.config.update("jax_num_cpu_devices", n)

    from prographmsa_tpu.parallel.mesh import make_mesh
    from prographmsa_tpu.parallel.sharded import sharded_nw_counts
    from prographmsa_tpu.distances.align import _load_scoring, GAP_PARAMS

    mesh = make_mesh(n)
    scoring = _load_scoring("aa")
    go, ge = GAP_PARAMS["aa"]
    B = PAIRS_PER_DEV * n
    rng = np.random.default_rng(0)
    s1b = rng.integers(0, 20, (B, L)).astype(np.int32)
    s2b = rng.integers(0, 20, (B, L)).astype(np.int32)
    l1 = np.full(B, L, np.int32)
    l2 = np.full(B, L, np.int32)

    out = sharded_nw_counts(mesh, s1b, s2b, l1, l2, scoring, go, ge, 20)
    jax.block_until_ready(out)                 # compile + warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = sharded_nw_counts(mesh, s1b, s2b, l1, l2, scoring, go, ge, 20)
        jax.block_until_ready(out)
        walls.append(time.perf_counter() - t0)
    return sorted(walls)[1]


def main():
    if len(sys.argv) > 1:                      # child mode
        n = int(sys.argv[1])
        print(json.dumps({"n": n, "wall_s": run_one(n)}))
        return

    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d" % n)
        out = subprocess.run([sys.executable, __file__, str(n)], env=env,
                             capture_output=True, text=True, check=True)
        rows.append(json.loads(out.stdout.strip().splitlines()[-1]))

    t1 = rows[0]["wall_s"]
    print("| devices | pairs | wall (s) | weak-scaling eff. |")
    print("|---|---|---|---|")
    for r in rows:
        print("| %d | %d | %.3f | %.0f%% |"
              % (r["n"], PAIRS_PER_DEV * r["n"], r["wall_s"],
                 100.0 * t1 / r["wall_s"]))


if __name__ == "__main__":
    main()
