"""Round-5: does grouping the HIGHEST-mode chunked-K dots win?

_frame_dots at HIGHEST splits K at chunk (w=512) granularity to bound the
fp32-emulation scoped-vmem stack (a whole-K=2048 dot OOMs at 22MB). This
A/Bs an intermediate grouping g=2 (two K=1024 dots per basis) against the
shipped g=1 (four K=512 dots) at the headline config, floor-corrected.

jit-cache hygiene: the arms monkeypatch fm._frame_dots, so each arm calls
_framed_analysis.__wrapped__ (unjitted) inside its OWN fresh outer jit —
sharing the inner jitted _framed_analysis between arms would silently
reuse the first arm's trace (the round-3 executable-cache foot-gun).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import features
from nnaudio_tpu.ops import framed_matmul as fm

SR, HOP, BATCH, LENGTH = 22050, 512, 32, 220500
AUDIO_S = BATCH * 10.0
ITERS = 32

_orig_frame_dots = fm._frame_dots


def grouped_frame_dots(g):
    def _fd(frame, wcos_ref, wsin_ref, u, *, w, n_chunks, tile_t, prec):
        if prec != jax.lax.Precision.HIGHEST or n_chunks % g:
            return _orig_frame_dots(frame, wcos_ref, wsin_ref, u, w=w,
                                    n_chunks=n_chunks, tile_t=tile_t,
                                    prec=prec)
        wg = w * g
        real = jnp.zeros((tile_t, wcos_ref.shape[1]), jnp.float32)
        imag = jnp.zeros((tile_t, wsin_ref.shape[1]), jnp.float32)
        for c in range(n_chunks // g):
            chunk = frame[u, :, c * wg : (c + 1) * wg]
            real = real + jnp.dot(chunk, wcos_ref[c * wg : (c + 1) * wg, :],
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
            imag = imag + jnp.dot(chunk, wsin_ref[c * wg : (c + 1) * wg, :],
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
        return real, imag
    return _fd


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
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(BATCH, LENGTH).astype(np.float32))

    st = features.STFT(n_fft=2048, hop_length=HOP,
                       output_format="Magnitude", verbose=False)
    wcos_t = jnp.asarray(st.forward_params["wcos"]).T
    wsin_t = jnp.asarray(st.forward_params["wsin"]).T
    n_fft, f = wcos_t.shape
    t_total = (LENGTH - n_fft) // HOP + 1
    plan = fm._plan(BATCH, n_fft, f, t_total, HOP, True)
    print(f"plan: {plan}", flush=True)
    inner = fm._framed_analysis.__wrapped__

    ref = None
    runners = {}
    for g in (1, 2, 4):
        fm._frame_dots = grouped_frame_dots(g)
        try:
            y = inner(x, wcos_t, wsin_t, HOP, highest=True, **plan)
            y.block_until_ready()
            if ref is None:
                ref = np.asarray(y[:1])
            err = float(np.max(np.abs(np.asarray(y[:1]) - ref)))
        except Exception as e:
            print(f"g={g}: SKIP ({type(e).__name__}: {str(e)[:100]})",
                  flush=True)
            continue
        finally:
            fm._frame_dots = _orig_frame_dots

        def mk(g=g):
            fm._frame_dots = grouped_frame_dots(g)
            try:
                @jax.jit
                def loop(xx):
                    acc = 0.0
                    for _ in range(ITERS):
                        y = inner(xx * (1 + acc * 1e-20), wcos_t, wsin_t,
                                  HOP, highest=True, **plan)
                        acc = acc + jnp.sum(y)
                    return acc
                float(loop(x))
            finally:
                fm._frame_dots = _orig_frame_dots

            def run():
                t0 = time.perf_counter()
                float(loop(x))
                return (time.perf_counter() - t0) / ITERS
            return run

        try:
            runners[g] = mk()
        except Exception as e:
            print(f"g={g}: SKIP loop ({type(e).__name__}: {str(e)[:100]})",
                  flush=True)
            continue
        print(f"g={g}: compiled, err-vs-g1 {err:.2e}", flush=True)

    times = {g: [] for g in runners}
    for rnd in range(5):
        for g, r in runners.items():
            times[g].append(r())
        print(f"-- round {rnd+1} --", flush=True)
        for g in runners:
            t = min(times[g])
            td = max(t - fl / ITERS / 1e3, 1e-9)
            print(f"g={g}: raw {t*1e3:6.2f} ms  dev {td*1e3:6.2f} ms  "
                  f"{AUDIO_S/td:9.0f} a-s/s", flush=True)


if __name__ == "__main__":
    main()
