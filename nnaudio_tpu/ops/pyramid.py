"""Fused multi-octave pyramid contraction (CQT2010/CQT2010v2/VQT).

The reference's pyramid (``cqt.py:805-1139``, ``vqt.py:85-140``) runs one
strided ``conv1d`` per octave on a successively downsampled signal. The
per-octave matmul shapes are hostile to a 128x128 MXU: N = bins_per_octave
(12) wastes >90% of the output lanes, the top octave has hop > width (the
chunk-free hop-decomposition in ops/dispatch.py does not apply, so it pays a
gather), and the deepest octave's hop (e.g. 8) unrolls into 32 chunked
einsums with K = 8. Seven ill-shaped dispatches + two concats per pyramid
dominate the transform's wall time; the arithmetic itself is ~3 GFLOP.

This module restructures the WHOLE pyramid into one batched contraction:

1. every level's frames are materialized by static slice/reshape copies
   (``materialize_frames`` — no gather: for pow-2 hop/width pairs the frame
   matrix is a strided view re-packing, the same trick as the
   hop-decomposition but with the frames written out once),
2. each level's (real, imag) banks are stacked into rows of one
   ``(2*n_filters, W_max)`` matrix (zero-padded past the level's true
   width — the padding multiplies real samples by 0.0, which is exact),
3. one batched einsum ``(L, B*T, W) x (L, 2F, W) -> (L, 2F, B*T)`` computes
   every octave's real and imaginary projections in a single XLA op.

Frames cost one extra HBM round-trip (~14 MB/level at the default config)
but every matmul lane does useful work and the 7 sequential dispatches,
the octave-0 gather, and the deep-octave chunk unrolls all disappear.

The op is natively differentiable (slices/reshapes/einsum only): trainable
CQT2010v2 banks receive summed gradients through the per-level stack, and
``dx`` flows back through the slice adjoints (overlapping frame regions
scatter-add, same as the reference's conv1d VJP).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import dot_precision, get_config
from ..core.frame import frame_signal, num_frames


def pyramid_enabled() -> bool:
    """Config gate for the fused pyramid path. None = auto: OFF until the
    on-chip A/B (tools/profile_r3b.py) proves the fused contraction beats
    the measured-known-good per-octave loop — the round-1 gather-based
    octave batching lost (10.5 vs 7.2 ms), and this redesign is exact but
    unmeasured on real hardware. Flip the auto policy with the data."""
    flag = get_config().use_fused_pyramid
    return False if flag is None else bool(flag)


def materialize_frames(x: jax.Array, width: int, hop: int,
                       t: int | None = None) -> jax.Array:
    """(B, L) -> (B, T, width) overlapping frames via static slice/reshape
    copies — no gather for hop/width pairs with a large common divisor.

    With g = gcd(width, hop), view the signal as rows of g samples; frame
    ``t`` is rows ``t*(hop/g) .. t*(hop/g) + width/g - 1``, so the frame
    tensor is ``width/g`` strided slices concatenated on the last axis.
    Falls back to the gather framer when that would exceed 64 slices.

    ``t`` overrides the frame count (callers framing at a padded width pass
    the true frame count of the unpadded width).
    """
    b, length = x.shape
    if t is None:
        t = num_frames(length, width, hop)
    g = math.gcd(width, hop)
    chunks = width // g
    if chunks > 64:
        need = (t - 1) * hop + width
        if need > length:
            x = jnp.pad(x, ((0, 0), (0, need - length)))
        return frame_signal(x[:, :need], width, hop)[:, :t]
    s = hop // g
    rows = (t - 1) * s + chunks
    need = rows * g
    if need > length:
        x = jnp.pad(x, ((0, 0), (0, need - length)))
    x2 = x[:, :need].reshape(b, rows, g)
    parts = [
        jax.lax.slice(x2, (0, c, 0), (b, c + (t - 1) * s + 1, g), (1, s, 1))
        for c in range(chunks)
    ]
    return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]


def pyramid_basis_pair(levels, banks_real, banks_imag, hops):
    """Whole-pyramid basis pair: per-level signals (already center-padded)
    against per-level (F, W_i) bank pairs -> ``(real, imag_raw)`` of shape
    ``(B, n_levels * F, T)``, bins concatenated in list order (callers pass
    deepest octave first, matching the reference's ``insert(0, ...)``
    assembly, cqt.py:1094-1113).

    Returns ``None`` when the static preconditions fail (per-level frame
    counts or filter counts disagree) — callers keep the per-octave loop.
    """
    n_levels = len(levels)
    f = banks_real[0].shape[0]
    widths = [br.shape[1] for br in banks_real]
    ts = [num_frames(lv.shape[-1], w, h)
          for lv, w, h in zip(levels, widths, hops)]
    if len(set(ts)) != 1 or any(br.shape[0] != f for br in banks_real):
        return None
    t = ts[0]
    b = levels[0].shape[0]
    w_max = max(widths)

    frames = jnp.stack(
        [materialize_frames(lv, w_max, h, t=t)
         for lv, h in zip(levels, hops)]
    )  # (L, B, T, w_max)

    def padded(bank, w):
        return bank if w == w_max else jnp.pad(bank, ((0, 0), (0, w_max - w)))

    bank_stack = jnp.stack([
        jnp.concatenate((padded(br, w), padded(bi, w)), axis=0)
        for br, bi, w in zip(banks_real, banks_imag, widths)
    ])  # (L, 2F, w_max)

    out = jnp.einsum(
        "lmw,lfw->lfm",
        frames.reshape(n_levels, b * t, w_max),
        bank_stack,
        precision=dot_precision(),
        preferred_element_type=jnp.float32,
    )  # (L, 2F, B*T)
    out = out.reshape(n_levels, 2, f, b, t)
    real = jnp.transpose(out[:, 0], (2, 0, 1, 3)).reshape(b, n_levels * f, t)
    imag = jnp.transpose(out[:, 1], (2, 0, 1, 3)).reshape(b, n_levels * f, t)
    return real, imag
