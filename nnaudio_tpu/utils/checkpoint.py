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


def restore_transform(transform, path: str) -> None:
    """Load parameters into an existing transform in place."""
    transform.load_state_dict(load_params(path))
