"""Fused on-device NW fill+backtrack vs the host-backtrack oracle path:
identical distance/variance matrices (all arithmetic is exact int32 on both
paths, and the backtrack comparison order matches
/root/reference/src/DistanceFactoryAlign.h:93-123)."""

import numpy as np
import pytest

from prographmsa_tpu.config import Options
from prographmsa_tpu.alphabet import AA_SPEC, DNA_SPEC
from prographmsa_tpu.io.fasta import read_fasta
from prographmsa_tpu.models.factory import get_default_model_factory
import prographmsa_tpu.distances.align as A


def _load(path, spec=AA_SPEC, strip_m=True):
    seqs_str, _ = read_fasta(path)
    seqs = {}
    for n, s in seqs_str.items():
        enc = spec.encode(s)
        if strip_m and len(enc) and enc[0] == ord("M"):
            enc = enc[1:]
        seqs[n] = enc
    return seqs


@pytest.mark.parametrize("fixture", ["fixtures/fam6.fasta",
                                     "fixtures/fam20.fasta"])
def test_nw_device_matches_host(fixture):
    opts = Options(mldist_flag=True, nwdist_flag=True)
    seqs = _load(fixture)
    order = sorted(seqs)
    factory = get_default_model_factory(opts, AA_SPEC)
    d1, v1 = A.compute_nw_distances(AA_SPEC, seqs, order, factory, opts,
                                    host_backtrack=True)
    d2, v2 = A.compute_nw_distances(AA_SPEC, seqs, order, factory, opts,
                                    host_backtrack=False)
    assert np.array_equal(d1, d2)
    assert np.array_equal(v1, v2)


def test_nw_device_multi_chunk():
    """Chunked launches (batch_pairs < n_pairs) agree with one launch."""
    opts = Options(mldist_flag=True, nwdist_flag=True)
    seqs = _load("fixtures/fam20.fasta")
    order = sorted(seqs)
    factory = get_default_model_factory(opts, AA_SPEC)
    d1, v1 = A.compute_nw_distances(AA_SPEC, seqs, order, factory, opts,
                                    batch_pairs=37)
    d2, v2 = A.compute_nw_distances(AA_SPEC, seqs, order, factory, opts)
    assert np.array_equal(d1, d2)
    assert np.array_equal(v1, v2)
