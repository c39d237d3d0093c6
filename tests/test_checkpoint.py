"""--checkpoint_dir phase checkpoint/resume: byte-identical output, work
actually skipped on resume, stale state never trusted."""

import numpy as np
import pytest

from prographmsa_tpu.config import Options
from prographmsa_tpu.io.fasta import read_fasta
import prographmsa_tpu.cli as cli
import prographmsa_tpu.tree.treenj as treenj

FIX = "fixtures"


def _run(opts):
    seqs, _ = read_fasta(opts.sequence_file)
    return cli.do_align(seqs, opts)


def _count_tree_nj(monkeypatch):
    calls = {"n": 0}
    orig = treenj.tree_nj

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(treenj, "tree_nj", counting)
    monkeypatch.setattr(cli, "tree_nj", counting)
    return calls


def test_resume_skips_tree_phases_and_is_identical(tmp_path, monkeypatch):
    base = Options(sequence_file=FIX + "/fam6.fasta", fasta_flag=True,
                   checkpoint_dir=str(tmp_path / "ck"))

    calls = _count_tree_nj(monkeypatch)
    aligned1, trees1 = _run(base)
    first_calls = calls["n"]
    assert first_calls == 3          # initial + 2 iterations

    calls["n"] = 0
    aligned2, trees2 = _run(base)
    assert calls["n"] == 0           # every tree phase resumed from disk
    assert aligned1 == aligned2
    assert ([t.format_newick() for t in trees1]
            == [t.format_newick() for t in trees2])

    # and identical to the run without any checkpointing
    aligned3, trees3 = _run(base.replace(checkpoint_dir=""))
    assert aligned1 == aligned3
    assert ([t.format_newick() for t in trees1]
            == [t.format_newick() for t in trees3])


def test_stale_checkpoint_is_ignored(tmp_path, monkeypatch):
    ck = str(tmp_path / "ck")
    a = Options(sequence_file=FIX + "/fam6.fasta", fasta_flag=True,
                checkpoint_dir=ck)
    _run(a)

    # different alignment-relevant options -> fingerprint mismatch
    b = a.replace(mldist_flag=True)
    calls = _count_tree_nj(monkeypatch)
    _run(b)
    assert calls["n"] == 3           # recomputed, stale state not trusted

    # and the new state belongs to b now: rerunning b resumes
    calls["n"] = 0
    _run(b)
    assert calls["n"] == 0


def test_checkpoint_with_fixed_tree(tmp_path):
    # -t implies iters=0: state holds only the parsed tree; resume works
    a = Options(sequence_file=FIX + "/fam6.fasta", fasta_flag=True,
                tree_file="fixtures/golden/tree0_fam6.nwk", iters=0,
                checkpoint_dir=str(tmp_path / "ck"))
    out1, _ = _run(a)
    out2, _ = _run(a)
    assert out1 == out2
