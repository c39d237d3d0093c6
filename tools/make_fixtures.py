"""Generate deterministic test fixtures: simulated protein/DNA families.

Sequences are evolved along a random binary tree under a simple
substitution+indel process so they are realistically alignable. Seeded,
so fixtures are reproducible.
"""

import os
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")

AA = "ACDEFGHIKLMNPQRSTVWY"
DNA = "ACGT"


def evolve(seq, rng, alphabet, sub_p=0.15, indel_p=0.03):
    out = []
    for c in seq:
        r = rng.rand()
        if r < indel_p / 2:
            continue  # deletion
        if r < indel_p:
            out.append(c)
            out.append(alphabet[rng.randint(len(alphabet))])  # insertion
            continue
        if rng.rand() < sub_p:
            out.append(alphabet[rng.randint(len(alphabet))])
        else:
            out.append(c)
    return "".join(out)


def make_family(n, length, alphabet, seed, start=None):
    rng = np.random.RandomState(seed)
    root = start or "".join(alphabet[rng.randint(len(alphabet))]
                            for _ in range(length))
    pool = [root]
    while len(pool) < n:
        parent = pool[rng.randint(len(pool))]
        pool.append(evolve(parent, rng, alphabet))
    names = ["seq%03d" % i for i in range(n)]
    return dict(zip(names, pool))


def write_fasta(path, fam):
    with open(path, "w") as f:
        for name in sorted(fam):
            f.write(">%s\n%s\n" % (name, fam[name]))


def make_codon_family(n, ncodons, seed):
    """DNA sequences that are valid ORFs (start ATG, no internal stops)."""
    rng = np.random.RandomState(seed)
    sense = []
    for c1 in "TCAG":
        for c2 in "TCAG":
            for c3 in "TCAG":
                cod = c1 + c2 + c3
                if cod not in ("TAA", "TAG", "TGA"):
                    sense.append(cod)

    def rand_codon():
        return sense[rng.randint(len(sense))]

    root = "ATG" + "".join(rand_codon() for _ in range(ncodons - 1))
    pool = [root]
    while len(pool) < n:
        parent = pool[rng.randint(len(pool))]
        cods = [parent[i:i + 3] for i in range(0, len(parent), 3)]
        out = []
        for cod in cods:
            r = rng.rand()
            if r < 0.015 and len(cods) > 10:
                continue
            if r < 0.03:
                out.append(cod)
                out.append(rand_codon())
                continue
            if rng.rand() < 0.12:
                out.append(rand_codon())
            else:
                out.append(cod)
        if out[0] != "ATG":
            out[0] = "ATG"
        pool.append("".join(out))
    names = ["orf%03d" % i for i in range(n)]
    return dict(zip(names, pool))


def main():
    os.makedirs(OUT, exist_ok=True)
    write_fasta(os.path.join(OUT, "fam6.fasta"),
                make_family(6, 60, AA, seed=1))
    write_fasta(os.path.join(OUT, "fam20.fasta"),
                make_family(20, 120, AA, seed=2))
    write_fasta(os.path.join(OUT, "fam100.fasta"),
                make_family(100, 200, AA, seed=3))
    write_fasta(os.path.join(OUT, "dna12.fasta"),
                make_family(12, 150, DNA, seed=4))
    write_fasta(os.path.join(OUT, "orf10.fasta"),
                make_codon_family(10, 50, seed=5))
    # a tiny 3-sequence case (exercises the NJ 3-leaf termination)
    write_fasta(os.path.join(OUT, "fam3.fasta"),
                make_family(3, 40, AA, seed=6))
    # HKY-ish custom DNA model (qmat: lower-tri exchangeabilities + freqs)
    with open(os.path.join(OUT, "dna.qmat"), "w") as f:
        f.write("1.0\n2.0 1.0\n1.0 2.0 1.0\n")
        f.write("0.3 0.2 0.2 0.3\n")
    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
