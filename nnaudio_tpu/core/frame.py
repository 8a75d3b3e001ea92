"""Signal shaping: broadcast, pad, frame. All jit-clean, static shapes.

The reference reaches framing implicitly through strided ``conv1d``
(``stft.py:290-293``); on TPU we frame explicitly (a gather with a static
index matrix) and feed the frames to a single MXU matmul. The gather's VJP is
a scatter-add, which gives overlap-add gradients for free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def broadcast_dim(x: jax.Array) -> jax.Array:
    """Accept ``(L,)``, ``(B, L)`` or ``(B, 1, L)``; return ``(B, L)``.

    Mirrors the reference's input contract (``utils.py:206-222``) but
    normalizes to 2-D — the channel axis carries no information here.
    """
    if x.ndim == 1:
        return x[None, :]
    if x.ndim == 2:
        return x
    if x.ndim == 3:
        if x.shape[1] != 1:
            raise ValueError(
                f"3-D input must have a singleton channel axis, got {x.shape}"
            )
        return x[:, 0, :]
    raise ValueError(
        "Only inputs of shape (len), (batch, len) or (batch, 1, len) are "
        f"supported; got {x.shape}"
    )


def pad_signal(x: jax.Array, pad_amount: int, pad_mode: str = "reflect") -> jax.Array:
    """Center padding on the last axis. ``reflect`` matches torch's
    ReflectionPad1d; ``constant`` zero-pads."""
    if pad_amount == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(pad_amount, pad_amount)]
    if pad_mode == "constant":
        return jnp.pad(x, widths, mode="constant")
    if pad_mode == "reflect":
        if x.shape[-1] < pad_amount + 1:
            raise ValueError(
                "Signal length shorter than reflect padding length (n_fft // 2)."
            )
        return jnp.pad(x, widths, mode="reflect")
    raise ValueError(f"pad_mode must be 'reflect' or 'constant', got {pad_mode!r}")


def num_frames(length: int, frame_length: int, hop: int) -> int:
    """Frames produced by a stride-``hop`` window of ``frame_length`` over
    ``length`` samples (conv1d 'valid' arithmetic)."""
    return (length - frame_length) // hop + 1


def frame_signal(x: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(B, L) -> (B, T, frame_length) overlapping frames.

    Materialized as ``q = ceil(frame_length/hop)`` static slice+reshape
    phase views concatenated on the last axis — NOT a gather. TPU gather
    moves one element per index; on the CQT2010v2 decimation chain the
    gather version measured 6.3 ms of a 6.7 ms forward (round-5 on-chip
    decomposition, tools/profile_r5_pyramid.py) vs ~0.5 ms roofline for
    the same bytes as contiguous copies. Phase view ``c`` is the
    ``(T, hop)`` reshape of ``x[c*hop:]``, so row ``t`` starts at
    ``t*hop + c*hop`` — concatenating the ``q`` views along the last axis
    yields rows ``x[t*hop : t*hop + q*hop]``, sliced to ``frame_length``.
    Bit-identical values to the gather; the VJP is ``q`` slice-adds (the
    same overlap-add gradient, scatter-free)."""
    t = num_frames(x.shape[-1], frame_length, hop)
    q = -(-frame_length // hop)
    if q > 128:
        # pathological overlap (hop << frame_length): concat operand count
        # would dominate — keep the gather
        idx = jnp.arange(t)[:, None] * hop + jnp.arange(frame_length)[None, :]
        return x[..., idx]
    lead = x.shape[:-1]
    need = (t + q - 1) * hop
    if x.shape[-1] < need:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, need - x.shape[-1])])
    view = x[..., :need].reshape(*lead, t + q - 1, hop)
    parts = [view[..., c: c + t, :] for c in range(q)]
    out = parts[0] if q == 1 else jnp.concatenate(parts, axis=-1)
    return out[..., :frame_length]


def frames_to_signal(frames: jax.Array, hop: int, length: int) -> jax.Array:
    """Overlap-add: (B, T, frame_length) -> (B, length) — the exact adjoint of
    :func:`frame_signal` (replaces the reference's ``fold`` at utils.py:52-56).

    When ``hop`` divides the frame length, the scatter is re-expressed as
    ``frame_length/hop`` static slice-adds on a ``(rows, hop)`` view (the
    inverse of the hop-decomposition in ops/dispatch.py) — TPU scatter-add is
    orders of magnitude slower than contiguous dynamic-update-slices."""
    t, n = frames.shape[-2], frames.shape[-1]
    lead = frames.shape[:-2]
    if n % hop == 0 and n // hop <= 64:
        n_chunks = n // hop
        rows = t + n_chunks - 1
        fr = frames.reshape(*lead, t, n_chunks, hop)
        out = jnp.zeros((*lead, rows, hop), dtype=frames.dtype)
        for c in range(n_chunks):
            out = out.at[..., c : c + t, :].add(fr[..., :, c, :])
        out = out.reshape(*lead, rows * hop)
        if rows * hop >= length:
            return out[..., :length]
        return jnp.pad(out, [(0, 0)] * len(lead) + [(0, length - rows * hop)])
    idx = (jnp.arange(t)[:, None] * hop + jnp.arange(n)[None, :]).reshape(-1)
    flat = frames.reshape(*lead, t * n)
    out = jnp.zeros((*lead, length), dtype=frames.dtype)
    return out.at[..., idx].add(flat)
