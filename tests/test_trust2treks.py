"""TRUST->T-Reks adapter: conversion parses with the T-Reks reader.

The adapter (trust2treks.py, port of /root/reference/trust2treks.py) must
emit exactly the block format ``parse_treks_output``
(RepeatDetectionTReks.cpp:61-151) consumes; this test feeds synthetic TRUST
output through the conversion and the parser and checks the recovered
repeat geometry — no Java needed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trust2treks import alias_fasta, convert_trust_output
from prographmsa_tpu.repeats_treks import parse_treks_output


def _trust_text(units, starts, lengths, alias="S1"):
    """Synthetic TRUST output: one sequence, one repeat section."""
    lines = [">%s" % alias, "# START LENGTH",
             "%d %d" % (starts[0], lengths[0])]
    for s, l in zip(starts[1:], lengths[1:]):
        lines.append("%d %d bits # Repeat" % (s, l))
    lines.append("# end of headers")
    for k, u in enumerate(units):
        lines.append(">%s_unit%d" % (alias, k))
        lines.append(u.lower())   # TRUST emits lowercase; adapter upcases
    lines.append("")
    return "\n".join(lines)


def test_alias_fasta_roundtrip():
    text, namemap = alias_fasta([">very long name with spaces\n", "ACDE\n",
                                 ">another|id\n", "FGHI\n"])
    assert text == ">S1\nACDE\n>S2\nFGHI\n"
    assert namemap == {"S1": "very long name with spaces",
                       "S2": "another|id"}


def test_contiguous_units_single_block():
    # sequence: 2 residues pad + 3 units of ABC + pad
    seq = "MM" + "ABC" * 3 + "DD"
    trust = _trust_text(["ABC", "ABC", "ABC"], [3, 6, 9], [3, 3, 3])
    treks = convert_trust_output(trust, {"S1": "seqA"})
    assert treks.startswith(">seqA\n")
    assert "Length: 3 residues" in treks
    assert "from  3 to 11" in treks
    assert "region Length:9" in treks
    reps = parse_treks_output(treks, {"seqA": seq})
    assert list(reps) == ["seqA"]
    (rep,) = reps["seqA"]
    assert rep.start == 2          # 0-based
    assert rep.len == 3
    assert rep.tr_hom == [0, 1, 2] * 3


def test_noncontiguous_runs_split_blocks():
    # two runs: units at 1,4 (contiguous) then a gap, then 10,13
    seq = "ABCABC" + "XYZ" + "ABCABC"
    trust = _trust_text(["ABC"] * 4, [1, 4, 10, 13], [3, 3, 3, 3])
    treks = convert_trust_output(trust, {"S1": "seqB"})
    assert treks.count("Length: 3 residues") == 2
    reps = parse_treks_output(treks, {"seqB": seq})
    assert len(reps["seqB"]) == 2
    assert reps["seqB"][0].start == 0
    assert reps["seqB"][1].start == 9


def test_gapped_units_region_length():
    # aligned width 4 with one gap column in unit 2: region length excludes it
    seq = "ABCDABC"
    trust = _trust_text(["ABCD", "ABC-"], [1, 5], [4, 3])
    treks = convert_trust_output(trust, {"S1": "seqC"})
    assert "from  1 to 7" in treks
    assert "region Length:6" in treks    # 7 residues minus 1 gap column
    reps = parse_treks_output(treks, {"seqC": seq})
    (rep,) = reps["seqC"]
    assert rep.len == 4
    assert rep.tr_hom == [0, 1, 2, 3, 0, 1, 2]


def test_single_unit_run_dropped():
    # a lone unit (no contiguous partner) emits no block
    trust = _trust_text(["ABC"], [5], [3])
    treks = convert_trust_output(trust, {"S1": "seqD"})
    assert "Length:" not in treks
    assert treks == ">seqD\n"
