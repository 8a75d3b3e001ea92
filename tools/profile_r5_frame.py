"""Round-5 on-chip check: slice/reshape frame_signal vs the old gather.

Before-numbers (gather, same session/chip class — tools/profile_r5_pyramid
log): CQT2010v2 fast full 6.67 ms (47.9k a-s/s), chain-only 6.30 ms.
Everything that frames through core.frame.frame_signal is affected:
the decimation chain (downsample_by_n), CFP's Fourier frames, polyphase
resample, the XLA-fallback framed ops.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import features, fast_mode

SR, HOP, BATCH, LENGTH = 22050, 512, 32, 220500
AUDIO_S = BATCH * 10.0


def make_timed(fn, *args, iters=4, label=""):
    @jax.jit
    def loop(*aa):
        acc = 0.0
        for _ in range(iters):
            y = fn(aa[0] * (1 + acc * 1e-20), *aa[1:])
            acc = acc + (sum(jnp.sum(v) for v in y)
                         if isinstance(y, (tuple, list)) else jnp.sum(y))
        return acc

    t0 = time.perf_counter()
    float(loop(*args))
    print(f"  [compiled {label} in {time.perf_counter() - t0:.0f}s]",
          flush=True)

    def run():
        t0 = time.perf_counter()
        float(loop(*args))
        return (time.perf_counter() - t0) / iters
    return run


def row(name, t, audio_s=AUDIO_S):
    print(f"{name:46s} {t*1e3:8.2f} ms  ({audio_s/t:7.0f} a-s/s)", flush=True)


def main():
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))

    with fast_mode():
        m = features.CQT2010v2(sr=SR, hop_length=HOP, n_bins=84,
                               bins_per_octave=12, verbose=False)
        p = dict(m.forward_params)
        runs = {
            "CQT2010v2 fast full (was 6.67)": make_timed(
                lambda xx: m._forward(p, xx, output_format="Magnitude"), x,
                label="cqt fast"),
            "chain only (was 6.30)": make_timed(
                lambda xx: tuple(m._pyramid_chain(p, xx)[0]), x,
                label="chain"),
        }
        v = features.VQT(sr=SR, hop_length=HOP, n_bins=84, gamma=2,
                         verbose=False)
        pv = dict(v.forward_params)
        runs["VQT fast full (was ~6.4-7.2)"] = make_timed(
            lambda xx: v._forward(pv, xx, output_format="Magnitude"), x,
            label="vqt fast")

        times = {k: [] for k in runs}
        for _ in range(6):
            for k, r in runs.items():
                times[k].append(r())
        for k in runs:
            row(k, min(times[k]))

    mh = features.CQT2010v2(sr=SR, hop_length=HOP, n_bins=84,
                            bins_per_octave=12, verbose=False)
    ph = dict(mh.forward_params)
    r = make_timed(lambda xx: mh._forward(ph, xx, output_format="Magnitude"),
                   x, label="cqt HIGHEST")
    row("CQT2010v2 HIGHEST full (was ~7.3-7.4)", min(r() for _ in range(6)))

    # CFP frames via frame_signal too (fs=16k)
    fs = 16000
    xl = jax.device_put(
        np.random.RandomState(0).randn(BATCH, fs * 10).astype(np.float32))
    c = features.Combined_Frequency_Periodicity(fs=fs, hop_length=320)
    pc = dict(c.forward_params)
    r = make_timed(lambda xx: c._forward(pc, xx), xl, iters=2, label="cfp")
    row("CFP full (was 59.8-60.3 ms)", min(r() for _ in range(6)))

    # polyphase resample 22050 -> 16000
    from nnaudio_tpu.features import resample as rsmp
    r = make_timed(lambda xx: rsmp(xx, 22050, 16000), x, label="resample")
    row("resample 22050->16000 (was ~4.2 ms)", min(r() for _ in range(6)))


if __name__ == "__main__":
    main()
