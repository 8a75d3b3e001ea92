"""Round-5: XLA pair backend A/B at small divisor hops (hop < 128).

ops/dispatch._xla_pair uses the hop-decomposition chunked einsum whenever
``n_fft % hop == 0 and n_fft//hop <= 32``. At hop < 128 each chunk is a
skinny-K (K = hop) einsum that collapses on the MXU (the round-5 dispatch
A/B measured 5.58 ms vs the fused kernel's 0.92 at 512/64 fast). The
fused kernel now takes the magnitude/power/filterbank ops there — but
``framed_basis_pair``/``framed_complex`` (Complex outputs, Griffin-Lim,
the VJP residual pair) still ride _xla_pair. This measures the
alternative frame_signal (slice-phase) + one big matmul path, which pays
(n_fft/hop)x HBM read amplification for full-width MXU dots.

Also re-checks the synthesis dispatch crossover (round-3 data was
floor-damped): fused synthesis+OLA vs XLA einsum+slice-add-OLA at the
headline and a speech hop, both precisions.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import fast_mode
from nnaudio_tpu.config import (get_config, set_use_pallas_synthesis)
from nnaudio_tpu.core.apply import apply_basis
from nnaudio_tpu.core.frame import frame_signal
from nnaudio_tpu.ops import dispatch

BATCH, LENGTH = 32, 220500
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


def timeit(fn, *args, label=""):
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
    print(f"  [{label}: compiled {time.perf_counter()-t0:.0f}s]", flush=True)

    def run():
        t0 = time.perf_counter()
        float(loop(*args))
        return (time.perf_counter() - t0) / ITERS
    return run


def frame_pair(x, wcos, wsin, hop):
    frames = frame_signal(x, wcos.shape[-1], hop)
    return apply_basis(frames, wcos), apply_basis(frames, wsin)


def main():
    fl = floor_ms()
    print(f"fetch floor {fl:.1f} ms", flush=True)
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(BATCH, LENGTH).astype(np.float32))

    runners = {}
    # ---- pair backends at small divisor hops
    for n_fft, hop in ((512, 64), (1024, 64), (512, 32)):
        wcos = jnp.asarray(rng.randn(n_fft // 2 + 1, n_fft), jnp.float32)
        wsin = jnp.asarray(rng.randn(n_fft // 2 + 1, n_fft), jnp.float32)
        for fastm, tag in ((False, "HI"), (True, "fa")):
            ctx = fast_mode() if fastm else None
            if ctx:
                ctx.__enter__()
            try:
                runners[f"pair-chunk {n_fft}/{hop} {tag}"] = timeit(
                    lambda xx, wc=wcos, ws=wsin, h=hop:
                        dispatch._xla_pair(xx, wc, ws, h),
                    x, label=f"chunk {n_fft}/{hop} {tag}")
                runners[f"pair-frame {n_fft}/{hop} {tag}"] = timeit(
                    lambda xx, wc=wcos, ws=wsin, h=hop:
                        frame_pair(xx, wc, ws, h),
                    x, label=f"frame {n_fft}/{hop} {tag}")
            finally:
                if ctx:
                    ctx.__exit__(None, None, None)

    # ---- synthesis dispatch re-check (headline + speech hop)
    for n_fft, hop in ((2048, 512), (512, 160)):
        f = n_fft // 2 + 1
        t = (LENGTH - n_fft) // hop + 1
        sre = jax.device_put(rng.randn(BATCH, f, t).astype(np.float32))
        sim = jax.device_put(rng.randn(BATCH, f, t).astype(np.float32))
        kc = jnp.asarray(rng.randn(f, n_fft), jnp.float32)
        ks = jnp.asarray(rng.randn(f, n_fft), jnp.float32)
        for fastm, tag in ((False, "HI"), (True, "fa")):
            for fuse in (True, False):
                ctx = fast_mode() if fastm else None
                if ctx:
                    ctx.__enter__()
                set_use_pallas_synthesis(fuse)
                try:
                    runners[f"synth {n_fft}/{hop} {tag} "
                            f"{'pallas' if fuse else 'xla'}"] = timeit(
                        lambda s1, s2=sim, kc=kc, ks=ks, h=hop:
                            dispatch.synthesis_ola(s1, s2, kc, ks, h),
                        sre, label=f"synth {n_fft}/{hop} {tag} {fuse}")
                finally:
                    set_use_pallas_synthesis(None)
                    if ctx:
                        ctx.__exit__(None, None, None)

    times = {k: [] for k in runners}
    for rnd in range(5):
        for k, r in runners.items():
            times[k].append(r())
        print(f"-- round {rnd+1} --", flush=True)
        for k in runners:
            t = min(times[k])
            td = max(t - fl / ITERS / 1e3, 1e-9)
            print(f"{k:28s} raw {t*1e3:7.2f} ms  dev {td*1e3:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
