"""Device mesh construction (supersedes the reference's vestigial NCCL
helpers, reference utils/misc.py:296-375; see SURVEY.md section 5.8).

The model is ~40 MB of weights, so the meaningful parallel axes are:

  dp — data parallel over scenes (training batches / eval scenes)
  sp — voxel-axis ("sequence") parallel within a scene, for outdoor scans
       that exceed one chip's HBM (KITTI-360 crops)

No TP/PP/EP: at hidden_dim=128 they would be pure overhead.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_dp: int | None = None, n_sp: int = 1,
              devices=None) -> Mesh:
    """Mesh with axes ('dp', 'sp'). Defaults to all devices on dp."""
    devices = devices if devices is not None else jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_sp
    if n_dp * n_sp > len(devices):
        raise ValueError(
            f"mesh {n_dp}x{n_sp} needs {n_dp * n_sp} devices, "
            f"have {len(devices)}")
    arr = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(arr, ("dp", "sp"))
