"""Device mesh construction.

The reference is single-process single-device (SURVEY.md §2.3); scaling here
is mesh + sharding annotations + XLA collectives — there is no NCCL-style
backend to port. Axes:

* ``data``  — batch / generation-stream parallelism (gradient allreduce and
  stream sharding ride ICI);
* ``model`` — channel parallelism for the wide skip/end projections
  (skip_channels=1024 x end_channels=512 dominate the canonical config,
  reference: train_script.py:21-22).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ``(data, model)`` mesh. With no arguments, all visible devices
    go to the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = mesh_utils.create_device_mesh((data, model), devices=np.asarray(devices))
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1, devices=jax.devices()[:1])


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))
