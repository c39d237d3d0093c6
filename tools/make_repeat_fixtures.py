"""Generate a repeat-containing protein family + a matching T-Reks-format
.trd file (so `--read_repeats` can be tested without Java/T-Reks, exactly
as the reference intends: RepeatDetectionTReks.cpp:153-157)."""

import os
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
AA = "ACDEFGHIKLMNPQRSTVWY"


def main():
    rng = np.random.RandomState(11)
    unit = "WLKEGH"
    fams = {}
    trd = []
    for s in range(8):
        name = "rep%02d" % s
        prefix = "".join(AA[rng.randint(20)] for _ in range(20 + s))
        n_units = 4 + (s % 3)
        units = []
        for u in range(n_units):
            uu = list(unit)
            if rng.rand() < 0.5:
                uu[rng.randint(len(unit))] = AA[rng.randint(20)]
            units.append("".join(uu))
        region = "".join(units)
        suffix = "".join(AA[rng.randint(20)] for _ in range(25))
        seq = prefix + region + suffix
        fams[name] = seq
        start = len(prefix) + 1  # 1-based
        trd.append(">" + name)
        trd.append("Length: %d residues - nb: %d  from  %d to %d - "
                   "Psim:0.9 region Length:%d"
                   % (len(unit), n_units, start,
                      start + len(region) - 1, len(region)))
        trd.extend(units)
        trd.append("*" * 22)

    with open(os.path.join(OUT, "rep8.fasta"), "w") as f:
        for n in sorted(fams):
            f.write(">%s\n%s\n" % (n, fams[n]))
    with open(os.path.join(OUT, "rep8.trd"), "w") as f:
        f.write("\n".join(trd) + "\n")
    print("wrote rep8.fasta / rep8.trd")


if __name__ == "__main__":
    main()
