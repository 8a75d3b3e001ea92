"""Decompose the VQT/CQT2010v2 pyramid's on-chip time: downsample chain vs
per-octave pairs vs epilogue, plus a calm-chip probe. Run on the TPU."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import features
from nnaudio_tpu.core.frame import broadcast_dim
from nnaudio_tpu.core.resample import downsample_by_n
from nnaudio_tpu.ops.dispatch import framed_basis_pair
from nnaudio_tpu.features.cqt import _center_pad

SR, HOP, BATCH, LENGTH = 22050, 512, 32, 220500
AUDIO_S = BATCH * 10.0


def probe():
    """Chip calmness probe: chained bf16 4096-squares, TFLOP/s."""
    n = 4096
    a = jnp.asarray(np.random.RandomState(0).randn(n, n), jnp.bfloat16)

    @jax.jit
    def loop(a):
        acc = 0.0
        x = a
        for _ in range(8):
            x = jnp.matmul(x, a, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16) * 1e-2
            acc += jnp.sum(x.astype(jnp.float32))
        return acc

    float(loop(a))
    t0 = time.perf_counter()
    float(loop(a))
    dt = (time.perf_counter() - t0) / 8
    return 2 * n**3 / dt / 1e12


def timeit(fn, *args, iters=8, repeats=6):
    @jax.jit
    def loop(*aa):
        acc = 0.0
        for _ in range(iters):
            y = fn(aa[0] * (1 + acc * 1e-20), *aa[1:])
            acc = acc + (sum(jnp.sum(v) for v in y) if isinstance(y, tuple)
                         else jnp.sum(y))
        return acc

    float(loop(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def main():
    print(f"probe: {probe():.1f} TFLOP/s bf16 (calm ~33 at n=4096)")
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))

    vq = features.VQT(sr=SR, hop_length=HOP, n_bins=84, bins_per_octave=12,
                      gamma=2, verbose=False)
    p = dict(vq.forward_params)

    t = timeit(lambda xx: vq._forward(p, xx, output_format="Magnitude"), x)
    print(f"VQT full:            {t*1e3:7.2f} ms  {AUDIO_S/t:9.0f} audio-s/s")

    def chain_only(xx):
        xx = broadcast_dim(xx)
        outs = []
        for i in range(vq.n_octaves):
            if i > 0:
                xx = downsample_by_n(xx, p["lowpass_filter"], 2)
            outs.append(xx)
        return tuple(outs)

    t = timeit(chain_only, x)
    print(f"downsample chain:    {t*1e3:7.2f} ms")

    # precompute levels on device, time the 7 pairs alone (pad+frame+matmul)
    levels = [jax.device_put(np.asarray(v)) for v in chain_only(x)]

    def pairs_only(x0, *lv):
        lv = (x0,) + lv
        hop = vq.hop_length
        outs = []
        for i in range(vq.n_octaves):
            if i > 0:
                hop //= 2
            pad = vq._octave_widths[i] // 2
            xo = _center_pad(lv[i], pad, vq.pad_mode)
            r, im = framed_basis_pair(
                xo, p[f"cqt_kernels_real_{i}"], p[f"cqt_kernels_imag_{i}"], hop)
            outs += [r, im]
        return tuple(outs)

    t = timeit(pairs_only, *levels)
    print(f"7 octave pairs:      {t*1e3:7.2f} ms")

    # single top-octave pair for scale
    def one_pair(x0):
        xo = _center_pad(x0, vq._octave_widths[0] // 2, vq.pad_mode)
        return framed_basis_pair(
            xo, p["cqt_kernels_real_0"], p["cqt_kernels_imag_0"], vq.hop_length)

    t = timeit(one_pair, levels[0])
    print(f"top octave pair:     {t*1e3:7.2f} ms")

    cq = features.CQT2010v2(sr=SR, hop_length=HOP, n_bins=84,
                            bins_per_octave=12, verbose=False)
    cp = dict(cq.forward_params)
    t = timeit(lambda xx: cq._forward(cp, xx, output_format="Magnitude"), x)
    print(f"CQT2010v2 full:      {t*1e3:7.2f} ms  {AUDIO_S/t:9.0f} audio-s/s")


if __name__ == "__main__":
    main()
