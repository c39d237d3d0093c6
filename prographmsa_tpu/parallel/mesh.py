"""Device-mesh construction.

One logical axis ``"pairs"`` is enough for this workload: every heavy batch
(all-pairs distances, per-tree-level node pairs) is embarrassingly data
parallel, and the model matrices (20x20..61x61) are tiny and replicated
(SURVEY.md §2.5: TP/PP/EP are N/A for this problem shape).
"""

from __future__ import annotations

import numpy as np


def make_mesh(n_devices: int | None = None, axis_name: str = "pairs"):
    """A 1-D mesh over the first ``n_devices`` visible devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def pad_to_multiple(arr: np.ndarray, mult: int, axis: int = 0,
                    fill=0) -> np.ndarray:
    n = arr.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)
