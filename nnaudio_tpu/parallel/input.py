"""Multi-host initialization and host-sharded input pipeline.

SURVEY.md §7 step 9: "multi-host init + host-sharded input pipeline". Each
host loads only its shard of the global utterance batch; the global array is
assembled logically (no cross-host copy) with
``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_initialize(**kwargs) -> None:
    """Initialize the multi-host JAX runtime (no-op when single-process).

    Call once per process before any other JAX API on a multi-host pod;
    forwards ``coordinator_address`` / ``num_processes`` / ``process_id``
    to ``jax.distributed.initialize``.

    Deliberately does NOT probe ``jax.process_count()`` first: that would
    initialize the local backend (after which ``distributed.initialize``
    is invalid) and always reports 1 pre-initialization anyway. Instead:
    explicit kwargs are forwarded verbatim (errors propagate); with no
    kwargs, cluster auto-detection is attempted and a plain single-process
    environment (no coordinator/cluster found) degrades to a no-op."""
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError) as e:
        if kwargs:  # an explicitly configured pod must not fail silently
            raise
        # No kwargs: only "no cluster was detected" degrades to a no-op.
        # A detected-but-unreachable cluster (grpc/coordinator failures)
        # must NOT silently fall back to single-process — every collective
        # afterwards would quietly compute per-host-local results.
        msg = str(e).lower()
        if "coordinator_address" in msg or "detect" in msg:
            return  # no cluster found: single-process no-op
        if "before any jax" in msg or "already initialized" in msg:
            # backend already live (single-process sessions hit this
            # whenever they compute first) — no-op, but say so: on a real
            # pod a too-late call must not silently degrade
            import warnings

            warnings.warn(f"distributed_initialize skipped: {e}")
            return
        raise


def global_batch_from_host_local(
    local_batch: np.ndarray, mesh: Mesh, axis: str = "data"
) -> jax.Array:
    """Assemble a globally batch-sharded array from per-host local batches.

    ``local_batch``: this host's (B_local, ...) slice, where
    ``B_local = B_global / num_hosts``. Returns a global (B_global, ...)
    array sharded over ``axis`` with zero cross-host transfers.
    """
    spec = P(axis, *([None] * (local_batch.ndim - 1)))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_batch)
    )


def iter_host_batches(dataset, mesh: Mesh, axis: str = "data"):
    """Wrap an iterator of host-local numpy batches into globally sharded
    device arrays — the input-pipeline seam for a multi-host training loop."""
    for local in dataset:
        yield global_batch_from_host_local(local, mesh, axis)
