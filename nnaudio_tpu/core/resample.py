"""FIR anti-aliased downsampling (CQT2010/VQT octave pyramid).

Replaces the reference's padded strided conv1d (``downsampling_by_n``,
``utils.py:73-124``). Implemented as a framed gather + basis contraction
rather than ``lax.conv_general_dilated``: identical arithmetic (symmetric
zero pad of ``(len(fir)-1)//2``, stride-``n`` valid windows), but XLA compiles
chains of gather+dot orders of magnitude faster than chains of conv ops (the
7-octave pyramid graph went from ~120s to <1s of XLA-CPU compile), and the
contraction rides the MXU/VPU on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import dot_precision
from .frame import frame_signal


def downsample_by_n(x: jax.Array, fir: jax.Array, n: int) -> jax.Array:
    """(B, L) -> (B, floor((L - 2)/n) + 1) strided FIR with symmetric zero
    padding of ``(len(fir)-1)//2`` (identical arithmetic to utils.py:98-100)."""
    taps = fir.shape[-1]
    pad = (taps - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    frames = frame_signal(xp, taps, n)  # (B, T, taps)
    return jnp.einsum(
        "btk,k->bt",
        frames,
        fir,
        precision=dot_precision(),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def downsample_by_2(x: jax.Array, fir: jax.Array) -> jax.Array:
    return downsample_by_n(x, fir, 2)
