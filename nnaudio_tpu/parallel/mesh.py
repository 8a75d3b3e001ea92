"""Device mesh construction and sharding helpers.

Axis convention (SURVEY.md §7 step 9): ``("data", "model")`` — batch DP over
``data``, kernel-bank TP over ``model``. Multi-host pods: call
``jax.distributed.initialize()`` before :func:`make_mesh`; ``jax.devices()``
then spans all hosts and XLA routes collectives over ICI/DCN.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh. ``data=None`` uses all remaining
    devices after ``model``."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def local_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch axis over ``data``, everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
