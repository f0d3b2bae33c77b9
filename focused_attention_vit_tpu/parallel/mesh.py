"""Mesh construction.

One mesh, two named axes: 'data' (batch / gradient all-reduce) and 'model'
(tensor parallelism). On a single host the mesh covers the local chips; the
same axis names extend to multi-host slices (DP over DCN, TP inside the ICI
domain) without API change — the design SURVEY.md §2.4 calls for.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    tp: int = 1,
    sp: int = 1,
    pp: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a (data, model[, seq][, stage]) mesh over the available devices.

    Args:
      n_devices: number of devices to use (default: all).
      tp: size of the 'model' axis; must divide n_devices. The 'model'
        axis is laid out over adjacent devices so TP collectives ride the
        fastest ICI links.
      sp: size of the 'seq' (sequence-parallel) axis; when > 1 the mesh
        gains a 'seq' axis (inner — its halo ppermutes ride the
        nearest-neighbour ICI links; see parallel/sequence.py).
      pp: size of the 'stage' (pipeline-parallel) axis; when > 1 the mesh
        gains a trailing 'stage' axis (innermost — per-tick activation
        hand-offs are nearest-neighbour; see parallel/pipeline.py).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % (tp * sp * pp):
        raise ValueError(
            f"tp={tp} * sp={sp} * pp={pp} must divide device count {n}"
        )
    shape = [n // (tp * sp * pp), tp]
    names = list(axis_names)
    if sp > 1:
        shape.append(sp)
        names.append("seq")
    if pp > 1:
        shape.append(pp)
        names.append("stage")
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, axis_names=tuple(names))
