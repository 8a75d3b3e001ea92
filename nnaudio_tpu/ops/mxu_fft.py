"""Real FFT as MXU matmul stages + VPU butterflies (the CFP hot path).

A round-2 microbench put XLA's TPU FFT lowering at ~0.14 TFLOP/s
effective — later found DCE-compromised and NOT reproduced in-pipeline
(see the gating paragraph below); the reference's CFP chain,
``cfp.py:119-150``, is built on exactly these length-N rffts. A dense
DFT matmul fixes the microbench throughput but cubes the
work (a (4001, 4001) HIGHEST matmul measured *slower* than the XLA FFT).
This module takes the middle road — a four-step Cooley–Tukey split sized
for the MXU:

  n-point real FFT
    -> pack even/odd samples into an m = n/2 complex FFT (standard trick)
    -> factor m = m1 * m2 with m2 a power of two and m1 chosen nearest
       128: the m1-point DFT stage is ONE planar complex matmul with a
       (m1, m1) basis — contraction and output both live on ~128 lanes,
       so the MXU runs it at full tilt instead of the 16x lane/sublane
       padding a small-radix stage would pay
    -> twiddle by W_m^(n2*k1) (elementwise, (m2, m1) grid)
    -> m2-point DFT along the sublane axis as log2(m2) radix-2
       butterfly levels (pure adds + one twiddle mul per level — VPU
       work on full 128-lane rows; m2 is small by construction so the
       unrolled level count stays tiny)
    -> Hermitian unpack back to the n/2+1 one-sided spectrum.

All twiddles/bases are fp64-built numpy constants; the matmul stage runs
at ``Precision.HIGHEST`` regardless of the package fast-mode (FFT error
compounds across CFP's layer chain; the matmul is ~1/30 of a dense DFT so
the fp32 cost is immaterial). Accuracy vs numpy fp64: ~1e-6 relative.

Gated by ``config.use_mxu_fft`` (None = auto: OFF everywhere). The round-4
on-chip A/B (tools/profile_r3b.py, calm chip at 32.6 TFLOP/s probe)
measured this path at 0.24x the XLA FFT for the full CFP chain (246.9 ms
vs 59.8 ms/batch) and 0.29x for the STFT-only variant — the round-2
"XLA TPU FFT runs at 0.14 TFLOP/s" datum that motivated it was collected
on a DCE-compromised microbench and does not reproduce inside the real
pipeline, where XLA fuses the rfft with the surrounding elementwise
chain. The kernel stays available (``use_mxu_fft=True``) for exactness
experiments; it is numerically validated at ~1e-6 vs numpy fp64
(tests/test_mxu_fft.py).
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_config


def mxu_fft_enabled() -> bool:
    flag = get_config().use_mxu_fft
    if flag is None:
        return False  # round-4 on-chip A/B: 0.24-0.29x the XLA FFT
    return bool(flag)


def _split_factors(m: int) -> tuple[int, int] | None:
    """m = m1 * m2 with m2 = 2**k, m1 nearest 128 (the matmul stage size).
    None when no factorization keeps the matmul stage MXU-sized."""
    best = None
    m2 = 1
    while True:
        m1 = m // m2
        if 2 <= m1 <= 640:
            score = abs(m1 - 128)
            if best is None or score < best[0]:
                best = (score, m1, m2)
        if m % (2 * m2) != 0:
            break
        m2 *= 2
    if best is None:
        return None
    return best[1], best[2]


@lru_cache(maxsize=16)
def _stage_constants(n: int):
    """fp64-built numpy constants for the n-point real FFT plan."""
    m = n // 2
    m1, m2 = _split_factors(m)
    # m1-point DFT basis, laid out for "...an,nk->...ak" (n1 rows, k1 cols)
    n1 = np.arange(m1)
    basis = np.exp(-2j * np.pi * np.outer(n1, n1) / m1)
    # four-step twiddle W_m^(n2*k1) on the (n2, k1) grid
    tw = np.exp(-2j * np.pi * np.outer(np.arange(m2), np.arange(m1)) / m)
    # Hermitian-unpack rotators W_n^k, k = 0..m
    rot = np.exp(-2j * np.pi * np.arange(m + 1) / n)
    f32 = lambda a: a.astype(np.float32)
    return (
        m1, m2,
        f32(basis.real), f32(basis.imag),
        f32(tw.real), f32(tw.imag),
        f32(rot.real), f32(rot.imag),
    )


@lru_cache(maxsize=64)
def _butterfly_twiddles(size: int):
    half = size // 2
    w = np.exp(-2j * np.pi * np.arange(half) / size)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _fft_pow2_axis(zr, zi):
    """In-axis(-2) power-of-two DFT: radix-2 decimation-in-time butterflies.
    Sublane-axis strided slices + full-lane elementwise work only."""
    size = zr.shape[-2]
    if size == 1:
        return zr, zi
    er, ei = _fft_pow2_axis(zr[..., 0::2, :], zi[..., 0::2, :])
    our, oui = _fft_pow2_axis(zr[..., 1::2, :], zi[..., 1::2, :])
    wr, wi = _butterfly_twiddles(size)
    wr = jnp.asarray(wr)[..., :, None]
    wi = jnp.asarray(wi)[..., :, None]
    tr = our * wr - oui * wi
    ti = our * wi + oui * wr
    return (
        jnp.concatenate((er + tr, er - tr), axis=-2),
        jnp.concatenate((ei + ti, ei - ti), axis=-2),
    )


def rfft_mxu(x: jax.Array) -> tuple[jax.Array, jax.Array] | None:
    """One-sided DFT of a real signal: (..., n) -> planar
    ``(re, im)``, each (..., n//2 + 1) — numerically the fp32 image of
    ``np.fft.rfft``. ``None`` when ``n`` has no MXU-sized plan (odd n or
    an odd part too large for one matmul stage)."""
    n = x.shape[-1]
    if n % 2 or _split_factors(n // 2) is None:
        return None
    m = n // 2
    m1, m2, br, bi, twr, twi, rotr, roti = _stage_constants(n)

    # pack: z[j] = x[2j] + i x[2j+1]
    zr = x[..., 0::2]
    zi = x[..., 1::2]
    lead = zr.shape[:-1]

    # (..., m) -> (..., m2, m1): flat complex index j = n1*m2 + n2; the
    # matmul stage contracts n1, which must land on the minor axis
    zr = jnp.swapaxes(zr.reshape(*lead, m1, m2), -1, -2)
    zi = jnp.swapaxes(zi.reshape(*lead, m1, m2), -1, -2)

    # m1-point DFT over lanes (one planar complex matmul, always fp32)
    hi = jax.lax.Precision.HIGHEST
    br = jnp.asarray(br)
    bi = jnp.asarray(bi)
    ar = (jnp.einsum("...an,nk->...ak", zr, br, precision=hi)
          - jnp.einsum("...an,nk->...ak", zi, bi, precision=hi))
    ai = (jnp.einsum("...an,nk->...ak", zr, bi, precision=hi)
          + jnp.einsum("...an,nk->...ak", zi, br, precision=hi))

    # four-step twiddle on the (n2, k1) grid
    twr = jnp.asarray(twr)
    twi = jnp.asarray(twi)
    tr = ar * twr - ai * twi
    ti = ar * twi + ai * twr

    # m2-point DFT along sublanes; result rows are k2, so (k2, k1)
    # flattens directly to the output index k = k2*m1 + k1
    cr, ci = _fft_pow2_axis(tr, ti)
    zr_full = cr.reshape(*lead, m)
    zi_full = ci.reshape(*lead, m)

    # Hermitian unpack: X[k] = E[k] + W_n^k O[k],
    # E = (Z[k] + conj(Z[m-k]))/2, O = -i(Z[k] - conj(Z[m-k]))/2, Z[m]=Z[0]
    zr_ext = jnp.concatenate((zr_full, zr_full[..., :1]), axis=-1)
    zi_ext = jnp.concatenate((zi_full, zi_full[..., :1]), axis=-1)
    zr_rev = jnp.flip(zr_ext, axis=-1)
    zi_rev = jnp.flip(zi_ext, axis=-1)
    er = 0.5 * (zr_ext + zr_rev)
    ei = 0.5 * (zi_ext - zi_rev)
    our = 0.5 * (zi_ext + zi_rev)
    oui = -0.5 * (zr_ext - zr_rev)
    rotr = jnp.asarray(rotr)
    roti = jnp.asarray(roti)
    re = er + our * rotr - oui * roti
    im = ei + our * roti + oui * rotr
    return re, im
