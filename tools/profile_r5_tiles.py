"""Round-5: floor-corrected tile-shape sweep for the fused analysis kernel.

Every tile A/B from rounds 1-4 carried the ~25 ms tunnel-fetch floor on
both arms (tools/profile_r5_chainstage.py), which damps measured ratios
toward 1: at the old iters=8 a variant 20% faster device-side showed up
as ~3% — inside chip noise. The plan choices in ``_plan`` ("f128 +8% at
HIGHEST vs f256", "t512 with the largest bb") were set on that damped
data, so this re-sweeps (tile_t, tile_f, bb) for the headline STFT
magnitude config with the corrected methodology (iters=32, floor
subtracted, interleaved repeats, exactness-checked per variant).

Run on the TPU: python tools/profile_r5_tiles.py
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
ROUNDS = 5


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


def make_plan(tile_t, tile_f, bb, n_fft, f, highest, t_total):
    w, q, n_chunks = fm.hop_envelope(HOP, n_fft)
    tile_t = min(tile_t, -(-t_total // 8) * 8)
    slab_rows = -(-(tile_t + (n_chunks - 1) * q) // 8) * 8
    return dict(w=w, q=q, n_chunks=n_chunks, tile_t=tile_t,
                tile_f=tile_f, bb=bb, slab_rows=slab_rows)


def main():
    fl = floor_ms()
    print(f"fetch floor {fl:.1f} ms ({fl/ITERS:.3f} ms/iter at {ITERS})",
          flush=True)
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(BATCH, LENGTH).astype(np.float32))

    st = features.STFT(n_fft=2048, hop_length=HOP,
                       output_format="Magnitude", verbose=False)
    wcos = jnp.asarray(st.forward_params["wcos"])  # (F, n_fft)
    wsin = jnp.asarray(st.forward_params["wsin"])
    wcos_t, wsin_t = wcos.T, wsin.T
    n_fft, f = wcos_t.shape
    t_total = (LENGTH - n_fft) // HOP + 1

    # fp64 oracle on one batch item for exactness
    xr = np.asarray(x[:1], np.float64)
    frames = np.lib.stride_tricks.sliding_window_view(
        xr, n_fft, axis=1)[:, ::HOP, :]
    ref = np.sqrt(
        (frames @ np.asarray(wcos_t, np.float64)) ** 2
        + (frames @ np.asarray(wsin_t, np.float64)) ** 2
    ).transpose(0, 2, 1)

    # t_total = 427 caps tile_t at 432, so the only real tile_t options are
    # 256 and 432; bb >= 4 at HIGHEST blows the VMEM budget (skipped by the
    # compile guard if tried).
    variants = [
        # HIGHEST: current default is (t432, f128, bb1)
        (True, 512, 128, 1), (True, 512, 128, 2),
        (True, 512, 256, 1), (True, 512, 256, 2),
        (True, 256, 128, 1), (True, 256, 128, 2), (True, 256, 128, 4),
        (True, 256, 256, 2),
        # fast: current default is (t432, f128, bb2) — control + 3 probes
        (False, 512, 128, 2), (False, 512, 256, 2),
        (False, 512, 128, 4), (False, 256, 128, 4),
    ]

    default_hi = fm._plan(BATCH, n_fft, f, t_total, HOP, True)
    default_fa = fm._plan(BATCH, n_fft, f, t_total, HOP, False)
    print(f"default plan HIGHEST: {default_hi}", flush=True)
    print(f"default plan fast:    {default_fa}", flush=True)

    runners, meta = {}, {}
    for highest, tile_t, tile_f, bb in variants:
        plan = make_plan(tile_t, tile_f, bb, n_fft, f, highest, t_total)
        key = (f"{'HI' if highest else 'fa'} t{plan['tile_t']} "
               f"f{tile_f} bb{bb}")
        if key in runners:
            continue
        try:
            t0 = time.perf_counter()
            y = fm._framed_analysis(x, wcos_t, wsin_t, HOP,
                                    highest=highest, **plan)
            err = float(jnp.max(jnp.abs(
                y[:1] - jnp.asarray(ref, jnp.float32))))
            ct = time.perf_counter() - t0
        except Exception as e:  # Mosaic VMEM OOM etc: skip the variant
            print(f"  {key}: SKIP ({type(e).__name__}: {str(e)[:90]})",
                  flush=True)
            continue
        tol = 2e-4 if highest else 5e-2
        if err > tol:
            print(f"  {key}: WRONG (err {err:.2e})", flush=True)
            continue

        def mk(plan=plan, highest=highest):
            @jax.jit
            def loop(xx):
                acc = 0.0
                for _ in range(ITERS):
                    y = fm._framed_analysis(xx * (1 + acc * 1e-20), wcos_t,
                                            wsin_t, HOP, highest=highest,
                                            **plan)
                    acc = acc + jnp.sum(y)
                return acc

            float(loop(x))

            def run():
                t0 = time.perf_counter()
                float(loop(x))
                return (time.perf_counter() - t0) / ITERS
            return run

        try:
            runners[key] = mk()
        except Exception as e:  # chained-loop VMEM OOM
            print(f"  {key}: SKIP loop ({type(e).__name__}: {str(e)[:90]})",
                  flush=True)
            continue
        meta[key] = err
        print(f"  {key}: compiled {ct:.0f}s, err {err:.1e}", flush=True)

    times = {k: [] for k in runners}
    for rnd in range(ROUNDS):
        for k, r in runners.items():
            times[k].append(r())
        print(f"\n-- round {rnd+1} --", flush=True)
        for k in sorted(runners, key=lambda k: min(times[k])):
            t = min(times[k])
            td = max(t - fl / ITERS / 1e3, 1e-9)
            tf = 2 * 2 * BATCH * t_total * f * 2048 / td / 1e12
            print(f"{k:22s} raw {t*1e3:6.2f} ms  dev {td*1e3:6.2f} ms  "
                  f"{AUDIO_S/td:9.0f} a-s/s  {tf:5.1f} TFLOP/s  "
                  f"err {meta[k]:.1e}", flush=True)


if __name__ == "__main__":
    main()
