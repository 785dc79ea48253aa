"""Device-mesh construction.

The reference's only distributed machinery is MPI data-parallel gradient
averaging (dreambooth.py:175,227). The TPU rebuild is mesh-first: a single
("data", "model") mesh covers data-parallel training AND tensor-parallel
inference; XLA inserts the collectives from sharding annotations (GSPMD),
riding ICI within a slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh. With data=None, all remaining devices
    go on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def local_mesh() -> Mesh:
    """Single-process mesh over all visible devices, data-parallel only."""
    return create_mesh(model=1)
