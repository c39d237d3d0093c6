"""Extract the published empirical rate-matrix data from the reference
sources into .npz data files.

The numbers are scientific data (WAG: Whelan & Goldman 2001; GONNET/Darwin:
Gonnet et al.; ECM: Kosiol, Holmes & Goldman 2007), embedded in the reference
as flat C initializer lists mapped column-major into an Eigen matrix
(reference: ModelFactoryWag.cpp `Eigen::Map<Model<AA>::Subst>(data)`).

Usage: python tools/extract_matrices.py
"""

import re
import numpy as np
import os

REF = "/root/reference/src"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "prographmsa_tpu", "models", "data")

_NUM = re.compile(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?")


def extract(path: str, dim: int) -> np.ndarray:
    with open(path) as f:
        text = f.read()
    m = re.search(r"double\s+data\[\]\s*=\s*\{(.*?)\};", text, re.S)
    assert m, path
    nums = [float(x) for x in _NUM.findall(m.group(1))]
    assert len(nums) == dim * dim, (path, len(nums))
    # Eigen::Map default storage is column-major
    return np.array(nums, dtype=np.float64).reshape(dim, dim, order="F")


def extract_int_blocks(path: str):
    """Extract the integer scoring-matrix data blocks from
    DistanceFactoryAlign.cpp: two ``int data[]`` blocks (AA 21x21 col-major
    map, codon 62x62 col-major map) and one comma-initializer (DNA 5x5,
    row-major)."""
    with open(path) as f:
        text = f.read()
    blocks = re.findall(r"int\s+data\[\]\s*=\s*\{(.*?)\};", text, re.S)
    mats = {}
    for blk in blocks:
        nums = [int(x) for x in re.findall(r"-?\d+", blk)]
        if len(nums) == 21 * 21:
            mats["aa"] = np.array(nums, dtype=np.int32).reshape(21, 21,
                                                               order="F")
        elif len(nums) == 62 * 62:
            mats["codon"] = np.array(nums, dtype=np.int32).reshape(62, 62,
                                                                   order="F")
    m = re.search(r"scoring_matrix\s*<<\s*(.*?);", text, re.S)
    nums = [int(x) for x in re.findall(r"-?\d+", m.group(1))]
    mats["dna"] = np.array(nums, dtype=np.int32).reshape(5, 5)  # row-major
    return mats


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, src, dim in [
        ("wag", "ModelFactoryWag.cpp", 20),
        ("darwin", "ModelFactoryDarwin.cpp", 20),
        ("ecm", "ModelFactoryEcm.cpp", 61),
    ]:
        q = extract(os.path.join(REF, src), dim)
        np.savez(os.path.join(OUT, "%s.npz" % name), Q=q)
        print(name, q.shape, "row-sum max |.|:",
              np.abs(q.sum(axis=1)).max())
    mats = extract_int_blocks(os.path.join(REF, "DistanceFactoryAlign.cpp"))
    np.savez(os.path.join(OUT, "nw_scoring.npz"), **mats)
    for k, v in mats.items():
        sym = np.array_equal(v, v.T)
        print("nw", k, v.shape, "symmetric:", sym)


if __name__ == "__main__":
    main()
