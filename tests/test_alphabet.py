import numpy as np
import pytest

from prographmsa_tpu import alphabet as al


def test_aa_roundtrip():
    s = "ACDEFGHIKLMNPQRSTVWY"
    seq = al.AA_SPEC.encode(s)
    assert al.AA_SPEC.decode(seq) == s
    vals = al.AA_SPEC.values(seq)
    assert list(vals) == list(range(20))
    assert al.AA_SPEC.is_valid(seq).all()


def test_aa_unknowns():
    seq = al.AA_SPEC.encode("AXBZU")
    vals = al.AA_SPEC.values(seq)
    assert vals[0] == 0
    assert (vals[1:] == 20).all()
    assert not al.AA_SPEC.is_valid(seq)[1:].any()


def test_aa_lowercase():
    assert list(al.AA_SPEC.values(al.AA_SPEC.encode("acy"))) == [0, 1, 19]


def test_gap_rejected():
    with pytest.raises(ValueError):
        al.AA_SPEC.encode("AC-D")
    with pytest.raises(ValueError):
        al.AA_SPEC.encode("AC_D")


def test_dna_value_table():
    # The reference's DNA::value() (Alphabet.cpp:204-206) indexes the AA
    # table — an OOB bug that segfaults its binary in --dna mode.  We use
    # the intended dna_translation_table (Alphabet.cpp:22-36): T/U=0, C=1,
    # A=2, G=3, X=4 unknown.
    seq = al.DNA_SPEC.encode("TCAGUXN")
    vals = al.DNA_SPEC.values(seq)
    assert list(vals) == [0, 1, 2, 3, 0, 4, al.INVALID]
    assert list(al.DNA_SPEC.is_valid(seq)) == [True] * 5 + [False, False]


def test_codon_pack():
    seq = al.CODON_SPEC.encode("ATGTTTTAATGG")
    # ATG=met, TTT=phe(index 0), TAA=stop->? TGG=trp
    assert al.CODON_SPEC.decode(seq[:1]) == "ATG"
    assert seq[1] == 0          # TTT is first sense codon
    assert seq[2] == al.INVALID  # stop codon is invalid
    assert al.CODON_SPEC.as_aa_chars(seq[3:4]) == "W"


def test_codon_translation_table_complete():
    assert len(al.CODON_STRINGS) == 61
    assert al.CODON_AA_CHARS[al.CODON_STRINGS.index("ATG")] == "M"
    assert al.CODON_AA_CHARS[al.CODON_STRINGS.index("TGG")] == "W"


def test_string_from_sequence_restores_case():
    seq = al.AA_SPEC.encode("ACD")
    # simulate alignment with a gap inserted
    aligned = np.array([seq[0], al.AA_SPEC.gap_code, seq[1], seq[2]],
                       dtype=np.int16)
    assert al.string_from_sequence(al.AA_SPEC, aligned, "aCd") == "a-Cd"
