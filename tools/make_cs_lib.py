"""Generate a small synthetic CS-profile library in the K4000.lib text
format (format specified by the reference parser, CSProfile.cpp:29-170).

The upstream K4000.lib blob is missing from the reference checkout, so this
synthetic library is fed to BOTH the reference binary and our implementation
for differential testing of the -c code path.
"""

import os
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "cs16.lib")
AA = "ACDEFGHIKLMNPQRSTVWY"
NPROF = 16
NCOLS = 13


def main():
    rng = np.random.RandomState(7)
    lines = ["ProfileLibrary (synthetic, for testing)",
             "NPROF\t%d" % NPROF,
             "NCOLS\t%d" % NCOLS,
             "ITERS\t1",
             "LOG\t1"]
    for k in range(NPROF):
        lines.append("ContextProfile")
        lines.append("INDEX\t%d" % k)
        lines.append("PRIOR\t%.8g" % (1.0 / NPROF))
        lines.append("NCOLS\t%d" % NCOLS)
        lines.append("ALPH\t20")
        lines.append("\t" + "\t".join(AA))
        # random Dirichlet-ish columns, encoded as -1000*log2(p)
        for col in range(1, NCOLS + 1):
            p = rng.dirichlet(np.ones(20) * 0.5)
            p = np.maximum(p, 1e-6)
            enc = np.round(-1000.0 * np.log2(p)).astype(int)
            lines.append("%d\t" % col + "\t".join(str(v) for v in enc))
        lines.append("//")
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
