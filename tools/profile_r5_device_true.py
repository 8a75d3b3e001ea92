"""Round-5: device-true transform times with the tunnel floor amortized.

tools/profile_r5_chainstage.py measured the axon fetch roundtrip at
~27 ms — at the repo-standard iters=8, EVERY historical number carries
~3.4 ms/iter of constant tunnel overhead (a local host pays none of it).
This re-measures the flagship transforms at iters=64 (floor ~0.42 ms/iter)
and prints both raw and floor-corrected times. Interleaved repeats.
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
ITERS = 32


def make_timed(fn, *args, label=""):
    @jax.jit
    def loop(*aa):
        acc = 0.0
        for _ in range(ITERS):
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
        return (time.perf_counter() - t0) / ITERS
    return run


def floor_ms():
    s = jax.device_put(np.float32(1.0))
    f = jax.jit(lambda a: a + 1.0)
    float(f(s))
    ts = []
    for _ in range(16):
        t0 = time.perf_counter()
        float(f(s))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    fl = floor_ms()
    print(f"fetch roundtrip floor: {fl:.1f} ms "
          f"(adds {fl/ITERS:.3f} ms/iter at iters={ITERS})", flush=True)
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))

    runs = {}

    def build(name, ctor, fmt="Magnitude", fastm=True):
        def mk():
            m = ctor()
            p = dict(m.forward_params)
            return make_timed(
                lambda xx: m._forward(p, xx, output_format=fmt), x, label=name)
        if fastm:
            with fast_mode():
                runs[name] = mk()
        else:
            runs[name] = mk()

    build("STFT 2048/512 mag fast", lambda: features.STFT(
        n_fft=2048, hop_length=HOP, output_format="Magnitude", verbose=False))
    build("CQT1992v2 84 fast", lambda: features.CQT1992v2(
        sr=SR, hop_length=HOP, n_bins=84, verbose=False))
    build("CQT2010v2 84 fast", lambda: features.CQT2010v2(
        sr=SR, hop_length=HOP, n_bins=84, verbose=False))
    build("VQT g2 fast", lambda: features.VQT(
        sr=SR, hop_length=HOP, n_bins=84, gamma=2, verbose=False))
    build("STFT 2048/512 mag HIGHEST", lambda: features.STFT(
        n_fft=2048, hop_length=HOP, output_format="Magnitude", verbose=False),
        fastm=False)
    build("CQT2010v2 84 HIGHEST", lambda: features.CQT2010v2(
        sr=SR, hop_length=HOP, n_bins=84, verbose=False), fastm=False)
    build("CQT1992v2 84 HIGHEST", lambda: features.CQT1992v2(
        sr=SR, hop_length=HOP, n_bins=84, verbose=False), fastm=False)
    def build_mel():
        with fast_mode():
            m = features.MelSpectrogram(sr=SR, n_fft=2048, hop_length=HOP,
                                        n_mels=128, verbose=False)
            p = dict(m.forward_params)
            runs["Mel 128 fast"] = make_timed(
                lambda xx: m._forward(p, xx), x, label="Mel 128 fast")
    build_mel()

    times = {k: [] for k in runs}
    for rnd in range(6):
        for k, r in runs.items():
            times[k].append(r())
        print(f"\n-- after round {rnd + 1} --", flush=True)
        print(f"{'transform':34s} {'raw':>9s} {'-floor':>9s} "
              f"{'a-s/s raw':>10s} {'a-s/s dev':>10s}", flush=True)
        for k in runs:
            t = min(times[k])
            td = max(t - fl / ITERS / 1e3, 1e-9)
            print(f"{k:34s} {t*1e3:7.2f} ms {td*1e3:7.2f} ms "
                  f"{AUDIO_S/t:10.0f} {AUDIO_S/td:10.0f}", flush=True)


if __name__ == "__main__":
    main()
