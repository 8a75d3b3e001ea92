"""Kernel-bank (tensor-parallel) sharding: basis rows across the ``model`` axis.

The CQT/Fourier basis is a ``(n_bins, n_fft)`` matrix; its rows are
independent output frequency bands, so splitting rows across chips needs **no
reduction** — each chip computes its bands and the output spectrogram is
frequency-sharded (BASELINE.json north star: "oversized CQT kernel banks are
sharded over chips"). The frequency-domain CQT1992 complex matmul keeps its
contraction axis (Fourier bins) replicated, so it too is reduction-free.
"""
from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .data import shard_batch
from .mesh import replicate

# parameter names whose leading axis is an output frequency band
_BANK_PARAM_PREFIXES = (
    "wsin",
    "wcos",
    "cqt_kernels_real",
    "cqt_kernels_imag",
    "mel_basis",
    "gammatone_basis",
    "chroma_basis",
)


def _param_spec(name: str, ndim: int, mesh_axis: str = "model"):
    if any(name == p or name.startswith(p + "_") for p in _BANK_PARAM_PREFIXES):
        return P(mesh_axis, *([None] * (ndim - 1)))
    return P()


def shard_kernel_bank(params: dict, mesh: Mesh) -> dict:
    """Place every bank-shaped parameter row-sharded over ``model``; everything
    else replicated. Bank row counts must divide the model-axis size."""
    out = {}
    for k, v in params.items():
        spec = _param_spec(k, v.ndim)
        if spec != P() and v.shape[0] % mesh.shape["model"]:
            spec = P()  # indivisible bank: replicate rather than fail
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def bank_sharded_apply(transform, mesh: Mesh, **static_kwargs):
    """Callable running ``transform`` with its kernel bank row-sharded over
    ``model`` and the batch over ``data``. Output: batch-sharded over ``data``
    and frequency-sharded over ``model``."""
    param_shardings = {
        k: NamedSharding(mesh, _param_spec(k, v.ndim))
        if not (_param_spec(k, v.ndim) != P() and v.shape[0] % mesh.shape["model"])
        else replicate(mesh)
        for k, v in transform._params.items()
    }
    fwd = jax.jit(
        functools.partial(transform._forward, **static_kwargs),
        in_shardings=(param_shardings, NamedSharding(mesh, P("data", None))),
    )

    def run(x, params=None):
        merged = dict(transform._params)
        if params:
            merged.update(params)
        merged = {k: jax.device_put(v, param_shardings[k]) for k, v in merged.items()}
        return fwd(merged, shard_batch(x, mesh))

    return run
