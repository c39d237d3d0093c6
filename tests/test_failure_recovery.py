"""Deterministic shard retry: a failed device/mesh NW launch recomputes the
same pure function on the fallback path and yields identical distances."""

import numpy as np
import pytest

from prographmsa_tpu.config import Options
from prographmsa_tpu.alphabet import AA_SPEC
from prographmsa_tpu.io.fasta import read_fasta
import prographmsa_tpu.distances.align as A
import prographmsa_tpu.parallel.sharded as sharded


def _seqs():
    raw, _ = read_fasta("fixtures/fam6.fasta")
    out = {}
    for n, s in raw.items():
        enc = AA_SPEC.encode(s)
        if len(enc) and chr(enc[0]) == "M":
            enc = enc[1:]
        out[n] = enc
    return out


def test_sharded_failure_recovers_identically(monkeypatch):
    opts = Options(mldist_flag=True, nwdist_flag=True, engine="device")
    from prographmsa_tpu.models.factory import WagModelFactory
    fac = WagModelFactory()
    seqs = _seqs()
    order = sorted(seqs)

    baseline = A.compute_nw_distances(AA_SPEC, seqs, order, fac, opts)

    def boom(*a, **kw):
        raise RuntimeError("injected shard failure")

    monkeypatch.setattr(sharded, "sharded_nw_counts", boom)
    recovered = A.compute_nw_distances(AA_SPEC, seqs, order, fac, opts)
    assert np.array_equal(np.asarray(baseline[0]), np.asarray(recovered[0]))
    assert np.array_equal(np.asarray(baseline[1]), np.asarray(recovered[1]))


def test_device_failure_falls_back_to_native(monkeypatch):
    opts = Options(mldist_flag=True, nwdist_flag=True, engine="device")
    from prographmsa_tpu.models.factory import WagModelFactory
    import prographmsa_tpu.distances.nw_device as nwd
    fac = WagModelFactory()
    seqs = _seqs()
    order = sorted(seqs)

    baseline = A.compute_nw_distances(AA_SPEC, seqs, order, fac, opts)

    def boom(*a, **kw):
        raise RuntimeError("injected device failure")

    monkeypatch.setattr(sharded, "sharded_nw_counts", boom)
    monkeypatch.setattr(nwd, "nw_counts_device", boom)
    recovered = A.compute_nw_distances(AA_SPEC, seqs, order, fac, opts)
    assert np.array_equal(np.asarray(baseline[0]), np.asarray(recovered[0]))
