"""Overlap-add synthesis helpers (iSTFT path).

Functional replacements for the reference's stateful ``fold``-based synthesis
(``utils.py:43-56``, ``stft.py:42-51``): window-sumsquare is computed inside
the jitted graph (differentiable w.r.t. a trainable window) instead of being
cached as Python-side module state.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .frame import frames_to_signal


def window_sumsquare(
    window: jax.Array, n_frames: int, hop: int, n_fft: int, power: int = 2
) -> jax.Array:
    """Sum of squared (or ``power``-ed) windows under overlap-add, shape
    ``(n_fft + hop*(n_frames-1),)``."""
    length = n_fft + hop * (n_frames - 1)
    tiles = jnp.broadcast_to(window[None, :] ** power, (n_frames, n_fft))
    return frames_to_signal(tiles, hop, length)


def overlap_add(frames_bft: jax.Array, hop: int) -> jax.Array:
    """(B, n_fft, T) frame stack -> (B, n_fft + hop*(T-1)) waveform."""
    frames = jnp.swapaxes(frames_bft, -1, -2)  # (B, T, n_fft)
    length = frames.shape[-1] + hop * (frames.shape[-2] - 1)
    return frames_to_signal(frames, hop, length)


def normalize_by_window_envelope(
    signal: jax.Array, w_sum: jax.Array, eps: float = 1e-10
) -> jax.Array:
    """Divide by window-sumsquare where it is numerically nonzero
    (stft.py:46-51)."""
    return jnp.where(w_sum > eps, signal / jnp.where(w_sum > eps, w_sum, 1.0), signal)


def extend_fbins(spec_ri: jax.Array) -> jax.Array:
    """Mirror ``n_fft//2+1`` onesided bins back to ``n_fft`` full bins.

    ``spec_ri``: (B, F, T, 2). Upper bins are the reversed interior with
    negated imaginary part (odd symmetry), as in ``utils.py:63-70``.
    """
    interior = spec_ri[:, 1:-1]
    upper = jnp.flip(interior, axis=1) * jnp.array([1.0, -1.0], dtype=spec_ri.dtype)
    return jnp.concatenate((spec_ri, upper), axis=1)
