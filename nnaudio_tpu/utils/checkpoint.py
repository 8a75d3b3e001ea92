"""Checkpoint / resume for transform parameter pytrees.

Equivalent of the reference's free ``state_dict()`` serialization
(SURVEY.md §5 "Checkpoint/resume"): orbax for sharded/async multi-host
checkpoints, ``.npz`` for the simple local case.
"""
from __future__ import annotations

import os
from typing import Mapping

import numpy as np
import jax


def save_params(path: str, params: Mapping[str, jax.Array]) -> None:
    """Save a flat params dict. ``path`` ending in ``.npz`` uses numpy;
    otherwise an orbax PyTree checkpoint directory."""
    if path.endswith(".npz"):
        np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
        return
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        # force=True: overwrite an existing checkpoint directory (orbax
        # refuses by default, breaking repeated saves to the same path)
        ckptr.save(os.path.abspath(path), dict(params), force=True)


def load_params(path: str) -> dict:
    if path.endswith(".npz"):
        with np.load(path) as data:
            return {k: data[k] for k in data.files}
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))


def restore_transform(transform, path: str, strict: bool = True) -> None:
    """Load parameters into an existing transform in place. ``strict``
    (default) raises on missing/unexpected keys (torch parity); pass
    ``strict=False`` to load the intersection, e.g. for checkpoints from
    an older package version with a different parameter set."""
    transform.load_state_dict(load_params(path), strict=strict)


def save_sharded(path: str, params: Mapping[str, jax.Array]) -> None:
    """Save a params pytree whose leaves may be sharded over a device mesh.

    Orbax writes each array shard-wise (every host persists only its
    addressable shards), so on a multi-host pod this is a collective:
    call it on ALL hosts with the same ``path``. The on-disk layout is
    mesh-shape-independent — restore may target any other mesh (see
    :func:`load_sharded`). Equivalent of serializing the reference's
    ``state_dict`` (stft.py:234-245), generalized to sharded parameters."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), dict(params), force=True)


def load_sharded(path: str, like: Mapping[str, jax.Array],
                 shardings: Mapping[str, jax.sharding.Sharding] | None = None,
                 ) -> dict:
    """Restore a checkpoint directly onto target shardings.

    ``like`` supplies shapes/dtypes (a params dict or ``ShapeDtypeStruct``
    tree — e.g. ``transform.params``); ``shardings`` maps parameter names to
    target placements (e.g. ``parallel.bank`` row-shardings on a **new**
    mesh, which may have a different shape than the mesh the checkpoint was
    saved from — orbax reshards on read, each host reading only the byte
    ranges its shards need). Names absent from ``shardings`` restore
    replicated on the default device set."""
    import orbax.checkpoint as ocp

    shardings = shardings or {}
    target = {
        k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=shardings.get(k))
        for k, v in like.items()
    }
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target)
