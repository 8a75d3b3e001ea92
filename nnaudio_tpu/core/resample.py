"""FIR anti-aliased downsampling (CQT2010/VQT octave pyramid).

Replaces the reference's padded strided conv1d (``downsampling_by_n``,
``utils.py:73-124``) with identical arithmetic (symmetric zero pad of
``(len(fir)-1)//2``, stride-``n`` valid windows) in an MXU-friendly shape:

Strided FIR as a **banded-matrix framed matmul**: a tile of ``R=128``
consecutive outputs reads ``n*(R-1) + K`` input samples, so framing with
length ``n*(R-1)+K`` at hop ``n*R`` and contracting with the banded matrix
``M[j, m] = fir[m - n*j]`` computes 128 outputs per MXU row. Input
duplication is ``1 + K/(nR)`` (≈2x for K=256, n=2) versus the ``K/n``-fold
(128x) blow-up of a naive per-output gather — the naive version materialized
multi-GB frame tensors inside the CQT pyramid. ``lax.conv_general_dilated``
is avoided for different reasons on each backend: XLA-CPU compiles conv
chains catastrophically slowly, and the TPU conv+consumer fusion is
pathological (see ops/dispatch.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import dot_precision
from .frame import frame_signal

_TILE_R = 128  # outputs per banded-matmul row tile


def _banded_matrix(fir: jax.Array, n: int, r: int) -> jax.Array:
    """(r, n*(r-1) + K) matrix with M[j, m] = fir[m - n*j]."""
    taps = fir.shape[-1]
    width = n * (r - 1) + taps
    j = np.arange(r)[:, None]
    m = np.arange(width)[None, :]
    k = m - n * j  # tap index per cell
    valid = (k >= 0) & (k < taps)
    gather = jnp.asarray(np.where(valid, k, 0))
    return jnp.where(jnp.asarray(valid), fir[gather], 0.0)


def compose_cascade(fir: np.ndarray, k: int) -> np.ndarray:
    """Equivalent single-stage filter (fp64) for ``k`` serial (fir, ↓2)
    stages: ``H_k = h ∗ ↑2h ∗ ↑4h ∗ … ∗ ↑2^{k-1}h``.

    The CQT2010/VQT octave pyramid applies the same lowpass+decimate stage
    serially per octave; composing lets every level be computed IN PARALLEL
    straight from the top-rate signal with one strided banded matmul each
    (``downsample_by_n(x, H_k, 2**k, pad=p*(2**k - 1))``), which is exact:
    out[m] = Σ_j H_k[j]·x[2^k·m + j − p(2^k−1)] reproduces the nested
    stages' arithmetic (including the per-stage floor truncation —
    floor(floor(L/2)/2)… = floor(L/2^k)) up to fp32 reassociation; the
    composition itself is done here in fp64."""
    h = np.asarray(fir, np.float64)
    out = h
    for i in range(1, k):
        up = np.zeros(((h.shape[-1] - 1) * 2**i + 1,), np.float64)
        up[:: 2**i] = h
        out = np.convolve(out, up)
    return out


def compose_cascade_jnp(fir: jax.Array, k: int) -> jax.Array:
    """Traceable twin of :func:`compose_cascade` for apply-time
    ``lowpass_filter`` overrides (possibly tracers under jit/grad): same
    ``H_k = h ∗ ↑2h ∗ … ∗ ↑2^{k-1}h`` composition in fp32 jnp ops. The
    fp32-vs-fp64 composition delta is far inside the parallel chain's
    fp32-reassociation tolerance (test_parallel_chain_matches_serial_*)."""
    out = fir
    for i in range(1, k):
        up_len = (fir.shape[-1] - 1) * 2**i + 1
        up = jnp.zeros((up_len,), fir.dtype).at[:: 2**i].set(fir)
        out = jnp.convolve(out, up)
    return out


def downsample_by_n(
    x: jax.Array, fir: jax.Array, n: int, pad: int | None = None
) -> jax.Array:
    """(B, L) -> (B, floor((L + 2p - K)/n) + 1), p = (K-1)//2 — identical
    arithmetic to utils.py:98-100. ``pad`` overrides p for composed-cascade
    filters (see :func:`compose_cascade`), whose group delay is set by the
    BASE stage's pad, not their own length."""
    taps = fir.shape[-1]
    if pad is None:
        pad = (taps - 1) // 2
    b, length = x.shape
    out_len = (length + 2 * pad - taps) // n + 1
    if out_len <= 0:
        # signal shorter than the (even-tap) FIR. Deliberate divergence:
        # the reference's conv1d RAISES here ("Kernel size can't be greater
        # than actual input size"); an empty result degrades gracefully at
        # the deepest pyramid octave of a very short input instead — the
        # pyramid callers' _center_pad switches reflect -> constant for any
        # level shorter than pad+1 (including length 0), so the empty level
        # becomes an all-zero padded frame, never a reflect of nothing
        # (regression: test_cqt.py::test_pyramid_empty_deepest_level).
        return x[:, :0]

    r = min(_TILE_R, out_len)
    n_tiles = -(-out_len // r)
    width = n * (r - 1) + taps
    hop = n * r
    # frames for tile t0 start at input offset t0*n*r in the padded signal
    need = (n_tiles - 1) * hop + width
    xp = jnp.pad(x, ((0, 0), (pad, max(0, need - length - pad))))
    frames = frame_signal(xp[:, :need], width, hop)  # (B, n_tiles, width)

    banded = _banded_matrix(fir, n, r)  # (r, width)
    out = jnp.einsum(
        "btw,rw->btr",
        frames,
        banded,
        precision=dot_precision(),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, n_tiles * r)[:, :out_len].astype(x.dtype)


def downsample_by_2(x: jax.Array, fir: jax.Array) -> jax.Array:
    return downsample_by_n(x, fir, 2)


def _resample_fir(up: int, down: int) -> np.ndarray:
    """scipy.signal.resample_poly's default FIR (Kaiser β=5, 10·max-rate
    half-length, gain ``up``), built in fp64 at trace time."""
    from scipy import signal

    max_rate = max(up, down)
    half_len = 10 * max_rate
    return signal.firwin(2 * half_len + 1, 1.0 / max_rate,
                         window=("kaiser", 5.0)) * up


def resample_poly(x: jax.Array, up: int, down: int,
                  fir: np.ndarray | None = None) -> jax.Array:
    """Rational-rate polyphase resampling as a banded framed matmul —
    bit-compatible with ``scipy.signal.resample_poly(x, up, down,
    window=('kaiser', 5.0))`` (tested to fp32 rounding, incl. 160/147).

    The upsample-filter-decimate pipeline collapses to
    ``y[n] = Σ_i x[i]·h[nM + half − iL]`` (``L=up``, ``M=down``, ``h``
    centered): a band of taps whose phase pattern repeats every ``L``
    outputs. Tiling ``R`` outputs per row with ``L | R`` makes every tile's
    banded matrix IDENTICAL (tile t's input window just slides by
    ``R·M/L``), so the whole resample is ``frames @ banded`` on the MXU —
    the same design as :func:`downsample_by_n`, generalized to rational
    rates. Gradients flow (plain jnp ops)."""
    g = int(np.gcd(up, down))
    up, down = up // g, down // g
    if up == down:
        return x
    h = _resample_fir(up, down) if fir is None else np.asarray(fir)
    taps = h.shape[-1]
    half = (taps - 1) // 2
    b, length = x.shape
    n_out = -(-length * up // down)  # exact integer ceil (scipy's length)

    r = up * max(1, round(128 / up)) if up <= 512 else up
    # input index range covered by one tile of outputs r0=0..r-1
    c = np.arange(r) * down + half
    i_lo = int(np.ceil((c[0] - taps + 1) / up))
    i_hi = int(c[-1] // up)
    width = i_hi - i_lo + 1
    hop_in = (r * down) // up  # integer: up | r

    banded = np.zeros((r, width))
    for rr in range(r):
        j = c[rr] - (i_lo + np.arange(width)) * up
        valid = (j >= 0) & (j < taps)
        banded[rr, valid] = h[j[valid]]

    n_tiles = -(-n_out // r)
    lpad = max(0, -i_lo)
    need = (n_tiles - 1) * hop_in + width
    xp = jnp.pad(x, ((0, 0), (lpad, max(0, need - length - lpad))))
    start = i_lo + lpad  # >= 0 by construction of lpad
    frames = frame_signal(xp[:, start:start + need] if start else
                          xp[:, :need], width, hop_in)
    out = jnp.einsum("btw,rw->btr", frames, jnp.asarray(banded, jnp.float32),
                     precision=dot_precision(),
                     preferred_element_type=jnp.float32)
    return out.reshape(b, n_tiles * r)[:, :n_out].astype(x.dtype)
