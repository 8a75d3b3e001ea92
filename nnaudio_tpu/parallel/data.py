"""Data-parallel execution: batch-axis sharding over the ``data`` mesh axis.

TPU-native replacement for the reference's ``torch.nn.DataParallel``
compatibility (SURVEY.md §2.3): instead of replicating a module and
scatter/gathering tensors in one process, the batch is laid out across chips
with a ``NamedSharding`` and the jitted transform runs SPMD — XLA inserts any
needed collectives. Per-example transforms need none, so sharded output is
bit-identical to single-device output (a property the test suite enforces).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import local_batch_sharding, replicate


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a (B, ...) array batch-sharded over the ``data`` axis. B must be
    divisible by the data-axis size."""
    x = jnp.asarray(x)
    n = mesh.shape["data"]
    if x.shape[0] % n:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by data-axis size {n}"
        )
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def data_parallel(transform, mesh: Mesh, **static_kwargs) -> Any:
    """Wrap a transform into a callable running batch-sharded on ``mesh``.

    Returns ``fn(x, params=None)``; ``x`` is (B, L) with B divisible by the
    data-axis size. Parameters are replicated (they are small bases); output
    stays batch-sharded.
    """
    import functools

    fwd = jax.jit(
        functools.partial(transform._forward, **static_kwargs),
        in_shardings=(replicate(mesh), local_batch_sharding(mesh)),
        out_shardings=local_batch_sharding(mesh),
    )

    def run(x, params=None):
        merged = dict(transform.forward_params)
        if params:
            merged.update(params)
        merged = jax.device_put(merged, replicate(mesh))
        return fwd(merged, shard_batch(x, mesh))

    return run
