"""Differential tests: our guide-tree pipeline vs the reference oracle
binary's golden outputs (fixtures/golden/tree0_*.nwk = `-T -i 0`)."""

import os

import pytest

from prographmsa_tpu.config import Options
from prographmsa_tpu.alphabet import AA_SPEC
from prographmsa_tpu.io.fasta import read_fasta
from prographmsa_tpu.models.factory import WagModelFactory
from prographmsa_tpu.tree.treenj import tree_nj

FIX = os.path.join(os.path.dirname(__file__), "..", "fixtures")


def build_initial_tree(fasta, options):
    seqs_str, _ = read_fasta(os.path.join(FIX, fasta))
    seqs = {}
    for name, s in seqs_str.items():
        enc = AA_SPEC.encode(s)
        # forcealign: strip leading 'M' (main.cpp:332-353)
        if not options.noforcealign_flag and len(enc) and enc[0] == ord("M"):
            enc = enc[1:]
        seqs[name] = enc
    factory = WagModelFactory()
    return tree_nj(AA_SPEC, seqs, False, factory, options)


@pytest.mark.parametrize("fasta,golden", [
    ("fam6.fasta", "tree0_fam6.nwk"),
    ("fam20.fasta", "tree0_fam20.nwk"),
    ("fam100.fasta", "tree0_fam100.nwk"),
])
def test_initial_guide_tree_matches_reference(fasta, golden):
    options = Options()
    tree = build_initial_tree(fasta, options)
    with open(os.path.join(FIX, "golden", golden)) as f:
        expected = f.read().strip()
    assert tree.format_newick() == expected


def _splits(tree):
    """Set of non-trivial unrooted leaf-bipartitions, canonicalized."""
    all_leaves = frozenset(n.name for n in _leaves(tree))
    splits = set()

    def rec(node):
        if node.is_leaf():
            return {node.name}
        acc = set()
        for c in node.children:
            acc |= rec(c)
        if 1 < len(acc) < len(all_leaves) - 1:
            a = frozenset(acc)
            splits.add(min(a, all_leaves - a, key=lambda s: sorted(s)))
        return acc
    rec(tree)
    return splits


def _leaves(tree):
    if tree.is_leaf():
        return [tree]
    out = []
    for c in tree.children:
        out.extend(_leaves(c))
    return out


def test_fam6_tree_exact():
    """fam6 hits the NJ dim-4 exact Q-tie; with Eigen-order reductions
    (eigen_compat.py, angle.py) the tie now breaks identically to the
    reference binary."""
    from prographmsa_tpu.io.newick import parse_newick
    options = Options()
    tree = build_initial_tree("fam6.fasta", options)
    with open(os.path.join(FIX, "golden", "tree0_fam6.nwk")) as f:
        golden = f.read().strip()
    assert tree.format_newick() == golden
    assert _splits(tree) == _splits(parse_newick(golden))
