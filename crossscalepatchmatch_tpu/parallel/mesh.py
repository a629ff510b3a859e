"""Device-mesh helpers for data-parallel + spatially-tiled execution.

The reference has no distributed execution at all (single process + two
OpenMP row loops, SURVEY.md section 2.3).  The TPU-native scaling model is a
2-D logical mesh:
  * axis "data": independent stereo pairs (batch DP) -- the analogue of the
    reference's "run the binary per pair";
  * axis "ty":   horizontal row-bands of one pair (spatial tiling, the
    stereo analogue of sequence/tensor parallelism) with halo exchange of
    images/volumes (static 17-row window halo) and plane state (per-sweep
    stencil halo) over ICI neighbors.
Both views of a pair stay on the same shard so the left-right consistency
check and view propagation never cross devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: int = 1, n_ty: Optional[int] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, ty) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_ty is None:
        n_ty = len(devices) // n_data
    if n_data * n_ty > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_ty} needs more than {len(devices)} devices")
    arr = np.asarray(devices[:n_data * n_ty]).reshape(n_data, n_ty)
    return Mesh(arr, ("data", "ty"))
