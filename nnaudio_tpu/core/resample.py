"""FIR anti-aliased downsampling (CQT2010/VQT octave pyramid).

Replaces the reference's padded strided conv1d (``downsampling_by_n``,
``utils.py:73-124``) with an XLA ``conv_general_dilated`` — a small
single-channel FIR that XLA maps well by itself; the hot compute of the
pyramid is in the per-octave basis matmuls, not here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import dot_precision


def downsample_by_n(x: jax.Array, fir: jax.Array, n: int) -> jax.Array:
    """(B, L) -> (B, out_len) strided FIR with symmetric zero padding of
    ``(len(fir)-1)//2`` (identical arithmetic to utils.py:98-100)."""
    pad = (fir.shape[-1] - 1) // 2
    out = jax.lax.conv_general_dilated(
        x[:, None, :],
        fir[None, None, :],
        window_strides=(n,),
        padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=dot_precision(),
    )
    return out[:, 0, :]


def downsample_by_2(x: jax.Array, fir: jax.Array) -> jax.Array:
    return downsample_by_n(x, fir, 2)
