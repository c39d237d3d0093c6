#!/usr/bin/env python
"""Scale benchmark: 500-sequence family, NW+ML distance guide tree.

The reference is strongest on small inputs (no startup/dispatch overhead);
at scale the O(N^2 L^2) all-pairs NW DP dominates and the batched kernels
win.  This measures `-T -i 0 --mldist --nwdist` (the distance + NJ stage,
124,750 pairs) end-to-end as separate processes:

  * reference binary
  * this framework, --engine device (batched wavefront kernel on the chip)
  * this framework, --engine native (threaded C++ host kernel)

and checks the produced trees are byte-identical to the reference's.
Writes SCALE500.json.  Run:  python tools/scale500_bench.py
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = "/root/reference/bin/ProGraphMSA_64"
FIXTURE = os.path.join(REPO, "fixtures", "fam500.fasta")
FLAGS = ["-T", "-i", "0", "--mldist", "--nwdist"]


def timed(cmd, out_path, env=None):
    t0 = time.perf_counter()
    subprocess.run(cmd + ["-o", out_path, FIXTURE], check=True,
                   capture_output=True, env=env)
    return time.perf_counter() - t0


def main():
    res = {}
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(REPO, ".jax_cache"))

    res["ref_wall_s"] = round(timed([REF_BIN] + FLAGS, "/tmp/s500_ref.nwk"),
                              2)
    ours = [sys.executable, "-m", "prographmsa_tpu.cli"] + FLAGS
    res["ours_device_wall_s"] = round(
        timed(ours + ["--engine", "device"], "/tmp/s500_dev.nwk", env), 2)
    res["ours_native_wall_s"] = round(
        timed(ours + ["--engine", "native"], "/tmp/s500_nat.nwk", env), 2)

    ref = open("/tmp/s500_ref.nwk").read()
    res["device_tree_identical"] = open("/tmp/s500_dev.nwk").read() == ref
    res["native_tree_identical"] = open("/tmp/s500_nat.nwk").read() == ref
    res["speedup_device"] = round(res["ref_wall_s"]
                                  / res["ours_device_wall_s"], 2)
    res["speedup_native"] = round(res["ref_wall_s"]
                                  / res["ours_native_wall_s"], 2)

    with open(os.path.join(REPO, "SCALE500.json"), "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
