"""Round-5: floor-corrected A/B of the main fused-kernel dispatches.

The shipped dispatch policy (Pallas fused magnitude/filterbank on TPU)
was set on rounds-2-3 data that carried the ~25 ms tunnel-fetch floor on
both arms — measured wins are damped toward 1, so the policy direction
is safe, but the TRUE device-side margins were never recorded. This
re-measures the headline STFT magnitude and the fused Mel composite,
Pallas vs XLA chain, at both precisions with the corrected methodology.

jit-cache hygiene: config.cache_salt() participates in the transforms'
own jit keys, but this tool times through FRESH outer jits per arm, with
the config toggled at trace time of each arm's loop.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import features, fast_mode
from nnaudio_tpu.config import set_use_pallas

SR, HOP, BATCH, LENGTH = 22050, 512, 32, 220500
AUDIO_S = BATCH * 10.0
ITERS = 32


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
    print(f"fetch floor {fl:.1f} ms", flush=True)
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))

    runners = {}

    def add(name, ctor, fastm, pallas, fmt=None):
        set_use_pallas(pallas)
        ctx = fast_mode() if fastm else None
        try:
            if ctx:
                ctx.__enter__()
            m = ctor()
            p = dict(m.forward_params)
            kw = dict(output_format=fmt) if fmt else {}

            @jax.jit
            def loop(xx):
                acc = 0.0
                for _ in range(ITERS):
                    y = m._forward(p, xx * (1 + acc * 1e-20), **kw)
                    acc = acc + jnp.sum(y)
                return acc

            t0 = time.perf_counter()
            float(loop(x))
            print(f"  [{name}: compiled {time.perf_counter()-t0:.0f}s]",
                  flush=True)
        finally:
            if ctx:
                ctx.__exit__(None, None, None)
            set_use_pallas(True)

        def run():
            t0 = time.perf_counter()
            float(loop(x))
            return (time.perf_counter() - t0) / ITERS
        runners[name] = run

    mk_mel = lambda: features.MelSpectrogram(sr=SR, n_fft=2048,
                                             hop_length=HOP, n_mels=128,
                                             verbose=False)
    configs = ((2048, 512), (512, 160), (1024, 256))
    if "--more" in sys.argv:
        # q=2 hops + whole-transform effects on the pyramid family
        configs = ((2048, 320), (512, 64), (2048, 512))
    for fastm, tag in ((False, "HI"), (True, "fa")):
        for pallas in (True, False):
            ptag = "pallas" if pallas else "xla"
            for n_fft, hop in configs:
                add(f"STFT{n_fft}/{hop} {tag} {ptag}",
                    lambda n_fft=n_fft, hop=hop: features.STFT(
                        n_fft=n_fft, hop_length=hop,
                        output_format="Magnitude", verbose=False),
                    fastm, pallas, fmt="Magnitude")
            if "--more" in sys.argv:
                add(f"CQT2010v2 {tag} {ptag}",
                    lambda: features.CQT2010v2(sr=SR, hop_length=HOP,
                                               n_bins=84, verbose=False),
                    fastm, pallas)
                add(f"CQT1992v2 {tag} {ptag}",
                    lambda: features.CQT1992v2(sr=SR, hop_length=HOP,
                                               n_bins=84, verbose=False),
                    fastm, pallas)
            else:
                add(f"Mel2048/512 {tag} {ptag}", mk_mel, fastm, pallas)

    times = {k: [] for k in runners}
    for rnd in range(5):
        for k, r in runners.items():
            times[k].append(r())
        print(f"-- round {rnd+1} --", flush=True)
        for k in runners:
            t = min(times[k])
            td = max(t - fl / ITERS / 1e3, 1e-9)
            print(f"{k:18s} raw {t*1e3:6.2f} ms  dev {td*1e3:6.2f} ms  "
                  f"{AUDIO_S/td:9.0f} a-s/s", flush=True)


if __name__ == "__main__":
    main()
