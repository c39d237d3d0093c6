#!/usr/bin/env python
"""AOT pre-warm of the device-tier kernel lattice (VERDICT r4 #7).

Drives the fused Pallas graph-DP pipeline over exactly the kernel shapes a
production workload hits — by running the workload's fixture once under
``--engine pallas`` — so every kernel's XLA compilation lands in the
persistent cache (``JAX_COMPILATION_CACHE_DIR``) before any production
process needs it.  ``--long`` additionally warms the long-sequence
(L=2000) tier-0 shape.

Cold-start facts measured on this repo's backends (see BASELINE.md):

* On a directly-attached TPU host, cached executables deserialize in
  ~seconds — after one warmup, a cold ``--engine pallas`` process starts
  essentially warm.
* On the axon-tunneled chip this repo develops against, the experimental
  plugin re-lowers Mosaic kernels at first execution even on a cache hit,
  so each distinct kernel shape costs its Mosaic compile once per
  process.  The remaining lever is the NUMBER of distinct shapes:
  ``PROGRAPHMSA_PALLAS_BUCKET=384`` (this tool's default) collapses the
  per-level lane buckets so a fam100-class run compiles ~4 kernels
  instead of ~8.
* ``--engine auto`` (the default) never pays any of this: the calibrated
  policy keeps short-pair levels on the native tier.

Usage:  python tools/warmup.py [--bucket 384] [--fixture f.fasta] [--long]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(REPO, ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=int, default=384,
                    help="lane-bucket floor to warm (must match the "
                         "production PROGRAPHMSA_PALLAS_BUCKET)")
    ap.add_argument("--fixture",
                    default=os.path.join(REPO, "fixtures", "fam100.fasta"),
                    help="FASTA whose guide-tree pipeline defines the "
                         "kernel shapes to warm")
    ap.add_argument("--tree", default=os.path.join(
        REPO, "fixtures", "golden", "tree0_fam100.nwk"))
    ap.add_argument("--long", action="store_true",
                    help="also warm the long-sequence (L=2000) shapes")
    ap.add_argument("--tier-floor", type=int, default=0,
                    help="PROGRAPHMSA_PALLAS_TIER_FLOOR to warm: collapse "
                         "small tiers into one shared kernel (set the same "
                         "env in production runs)")
    args = ap.parse_args()
    if args.bucket:
        os.environ["PROGRAPHMSA_PALLAS_BUCKET"] = str(args.bucket)
    if args.tier_floor:
        os.environ["PROGRAPHMSA_PALLAS_TIER_FLOOR"] = str(args.tier_floor)

    import numpy as np

    from prographmsa_tpu.config import Options
    from prographmsa_tpu.io.fasta import read_fasta
    from prographmsa_tpu.cli import do_align

    t0 = time.perf_counter()
    seqs, _ = read_fasta(args.fixture)
    opts = Options(sequence_file=args.fixture, fasta_flag=True,
                   engine="pallas", iters=0,
                   tree_file=args.tree if os.path.exists(args.tree) else "")
    do_align(seqs, opts)
    print("pipeline warm (%s): %.1f s"
          % (os.path.basename(args.fixture), time.perf_counter() - t0),
          flush=True)

    if args.long:
        from prographmsa_tpu.alphabet import AA_SPEC
        from prographmsa_tpu.graph.graph import sequence_graph
        from prographmsa_tpu.models.factory import WagModelFactory
        from prographmsa_tpu.align.scores import DynProgScores
        from prographmsa_tpu.align.graph_dp_pallas import align_pairs_device

        t0 = time.perf_counter()
        fact = WagModelFactory()
        model = fact.get_model(0.7, Options(), 0.7)
        rng = np.random.default_rng(0)
        aas = list("ACDEFGHIKLMNPQRSTVWY")
        items = []
        for _ in range(8):
            g1 = sequence_graph(AA_SPEC, AA_SPEC.encode(
                "".join(rng.choice(aas) for _ in range(2000))))
            g2 = sequence_graph(AA_SPEC, AA_SPEC.encode(
                "".join(rng.choice(aas) for _ in range(1980))))
            items.append((g1, g2, model,
                          DynProgScores(g1, g2, model, Options())))
        align_pairs_device(items, interpret=False, s_mode="device")
        print("long-sequence warm: %.1f s" % (time.perf_counter() - t0),
              flush=True)


if __name__ == "__main__":
    main()
