"""Device mesh + sharding helpers — the framework's communication backend.

The reference has no distributed layer at all (SURVEY.md §2: single
``model.to(device)``, DataLoader workers only). The TPU-native equivalent is
a ``jax.sharding.Mesh`` over ICI with two axes:

  - ``data``:  batch-dimension data parallelism. Gradients are reduced with
    the psum GSPMD inserts automatically when replicated params meet sharded
    activations; BatchNorm's batch reductions become cross-replica
    collectives too (i.e. sync-BN across the data axis for free).
  - ``space``: optional spatial partitioning of the image H dimension for
    very large inputs; GSPMD inserts the conv halo exchanges.

Everything goes through ``jax.jit`` with NamedSharding annotations — no
hand-written collectives on the training path; XLA lays the collectives on
ICI links.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    n_data: int | None = None,
    n_space: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, space) mesh over the available devices.

    Defaults to all devices on the data axis. ``n_data * n_space`` must
    divide the device count; extra devices are left unused (trimmed).
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_space
    needed = n_data * n_space
    if needed > len(devices):
        raise ValueError(
            f"mesh ({n_data}x{n_space}) needs {needed} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:needed]).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh, ndim: int, space_axis: int | None = 1) -> NamedSharding:
    """NamedSharding for an activation batch: dim0 on data, H on space."""
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if space_axis is not None and ndim > space_axis and mesh.shape[SPACE_AXIS] > 1:
        spec[space_axis] = SPACE_AXIS
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch_arrays(mesh: Mesh, *arrays):
    """Device_put a tuple of host arrays with batch sharding (dim 0 on data).

    Images (ndim 4) additionally shard H over the space axis; masks (ndim 3)
    do too, so elementwise loss terms stay local.
    """
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        space_axis = 1 if a.ndim >= 3 else None
        out.append(jax.device_put(a, batch_sharding(mesh, a.ndim, space_axis)))
    return tuple(out)
