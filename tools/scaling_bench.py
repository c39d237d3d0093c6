#!/usr/bin/env python
"""Weak-scaling of the sharded kernels on a virtual CPU mesh.

Two stages, each B = const * n pairs over n in {1, 2, 4, 8} fake CPU
devices (one process, XLA host-platform device count), reporting wall time
and weak-scaling efficiency t(1)/t(n):

* nw       — the all-pairs NW distance kernel (sharded_nw_counts)
* graphdp  — the production graph-pair DP level batch
             (align_pairs_device with a mesh; interpret-mode kernel on
             CPU, identical partitioning to the TPU program)

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


def _force_cpu_devices(n: int):
    """Pin the CPU backend BEFORE any devices() call (the axon
    sitecustomize otherwise routes even n=1 onto the tunneled TPU — the
    round-3/4 tables' n=1 anomaly was exactly that: the n=1 row
    benchmarked a different backend; VERDICT r4 #8), then rebuild the
    client if the virtual device count is still short."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < n:
        from jax._src import xla_bridge
        xla_bridge._clear_backends()
        jax.clear_caches()
        jax.config.update("jax_num_cpu_devices", n)
    assert len(jax.devices()) >= n
    assert jax.devices()[0].platform == "cpu"


def run_one(n: int) -> float:
    """Executed in a child process (device count is fixed at backend init)."""
    sys.path.insert(0, REPO)
    import numpy as np

    _force_cpu_devices(n)
    import jax

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


GRAPHDP_GROUPS_PER_DEV = 2       # 16 pairs per device per level batch


def run_graphdp(n: int) -> float:
    """Weak-scaling of the mesh-sharded Pallas level batch (the production
    graph-DP path of engine/level_driver.py)."""
    sys.path.insert(0, REPO)
    import numpy as np

    _force_cpu_devices(n)
    import jax

    from prographmsa_tpu.parallel.mesh import make_mesh
    from prographmsa_tpu.config import Options
    from prographmsa_tpu.alphabet import AA_SPEC
    from prographmsa_tpu.graph.graph import sequence_graph
    from prographmsa_tpu.models.factory import WagModelFactory
    from prographmsa_tpu.align.scores import DynProgScores
    from prographmsa_tpu.align.graph_dp_pallas import align_pairs_device

    mesh = make_mesh(n)
    opts = Options()
    model = WagModelFactory().get_model(0.4, opts)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    rng = np.random.default_rng(0)
    items = []
    for _ in range(8 * GRAPHDP_GROUPS_PER_DEV * n):
        s1 = "".join(rng.choice(list(aas)) for _ in range(64))
        s2 = "".join(rng.choice(list(aas)) for _ in range(60))
        g1 = sequence_graph(AA_SPEC, AA_SPEC.encode(s1))
        g2 = sequence_graph(AA_SPEC, AA_SPEC.encode(s2))
        items.append((g1, g2, model, DynProgScores(g1, g2, model, opts)))

    align_pairs_device(items, interpret=True, mesh=mesh)   # compile + warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = align_pairs_device(items, interpret=True, mesh=mesh)
        walls.append(time.perf_counter() - t0)
        assert all(r is not None for r in out)
    return sorted(walls)[1]


def main():
    if len(sys.argv) > 2:                      # child mode
        stage, n = sys.argv[1], int(sys.argv[2])
        wall = run_one(n) if stage == "nw" else run_graphdp(n)
        print(json.dumps({"n": n, "wall_s": wall}))
        return

    for stage, per_dev in (("nw", PAIRS_PER_DEV),
                           ("graphdp", 8 * GRAPHDP_GROUPS_PER_DEV)):
        rows = []
        for n in (1, 2, 4, 8):
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=%d"
                                % n)
            out = subprocess.run([sys.executable, __file__, stage, str(n)],
                                 env=env, capture_output=True, text=True,
                                 check=True)
            rows.append(json.loads(out.stdout.strip().splitlines()[-1]))

        t1 = rows[0]["wall_s"]
        print("%s:" % stage)
        print("| devices | pairs | wall (s) | weak-scaling eff. |")
        print("|---|---|---|---|")
        for r in rows:
            print("| %d | %d | %.3f | %.0f%% |"
                  % (r["n"], per_dev * r["n"], r["wall_s"],
                     100.0 * t1 / r["wall_s"]))


if __name__ == "__main__":
    main()
