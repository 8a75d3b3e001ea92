"""Round-3b on-chip A/B: fused pyramid vs per-octave loop, and a CFP time
decomposition (what the two length-8000 XLA rffts actually cost). Run on
the TPU; interleaved repeats so shared-chip drift cancels."""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import features, fast_mode
from nnaudio_tpu.config import set_use_fused_pyramid

SR, HOP, BATCH, LENGTH = 22050, 512, 32, 220500
AUDIO_S = BATCH * 10.0


def probe():
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


def make_timed(fn, *args, iters=8):
    @jax.jit
    def loop(*aa):
        acc = 0.0
        for _ in range(iters):
            y = fn(aa[0] * (1 + acc * 1e-20), *aa[1:])
            acc = acc + (sum(jnp.sum(v) for v in y) if isinstance(y, tuple)
                         else jnp.sum(y))
        return acc

    float(loop(*args))  # compile
    def run():
        t0 = time.perf_counter()
        float(loop(*args))
        return (time.perf_counter() - t0) / iters
    return run


_WINS: dict[str, list[bool]] = {}


def ab(name, run_a, run_b, repeats=6, decide: str | None = None):
    ta, tb = [], []
    for _ in range(repeats):
        ta.append(run_a())
        tb.append(run_b())
    a, b = min(ta), min(tb)
    print(f"{name}: A {a*1e3:7.2f} ms ({AUDIO_S/a:7.0f} a-s/s)  "
          f"B {b*1e3:7.2f} ms ({AUDIO_S/b:7.0f} a-s/s)  A/B {b/a:.2f}x")
    if decide:
        _WINS.setdefault(decide, []).append(a < b)


def recommend():
    for policy, wins in _WINS.items():
        n = sum(wins)
        verdict = ("auto should take the A path" if n == len(wins)
                   else "auto should take the B path" if n == 0
                   else f"mixed ({n}/{len(wins)} A wins) — set auto per config")
        print(f"RECOMMENDATION [{policy}]: A wins {n}/{len(wins)} -> {verdict}"
              " (A = fused pyramid / MXU rfft; B = per-octave loop / XLA fft)")


def pyramid_ab():
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))
    for prec_name, ctx in [("HIGHEST", None), ("fast", fast_mode)]:
        for cls, kw, label in [
            (features.VQT, dict(gamma=2), "VQT"),
            (features.CQT2010v2, dict(), "CQT2010v2"),
        ]:
            def build(fused):
                set_use_fused_pyramid(fused)
                m = cls(sr=SR, hop_length=HOP, n_bins=84, bins_per_octave=12,
                        verbose=False, **kw)
                p = dict(m.forward_params)

                def f(xx):
                    return m._forward(p, xx, output_format="Magnitude")
                return make_timed(f, x)

            if ctx is None:
                run_f, run_l = build(True), build(False)
            else:
                with ctx():
                    run_f, run_l = build(True), build(False)
            ab(f"{label:10s} {prec_name:7s} fused(A) vs loop(B)", run_f, run_l,
               decide="use_fused_pyramid")
            set_use_fused_pyramid(None)


def cfp_decompose():
    from nnaudio_tpu.config import set_use_mxu_fft

    fs, hop = 16000, 320
    xl = jax.device_put(
        np.random.RandomState(0).randn(BATCH, fs * 10).astype(np.float32))
    m = features.Combined_Frequency_Periodicity(fs=fs, hop_length=hop)
    p = dict(m.forward_params)

    set_use_mxu_fft(False)
    run_full = make_timed(lambda xx: m._forward(p, xx), xl, iters=4)
    run_stft = make_timed(lambda xx: m._stft_mag(p, xx), xl, iters=4)
    set_use_mxu_fft(True)
    run_full_mxu = make_timed(lambda xx: m._forward(p, xx), xl, iters=4)
    run_stft_mxu = make_timed(lambda xx: m._stft_mag(p, xx), xl, iters=4)
    set_use_mxu_fft(None)
    ab("CFP full  mxu(A) vs xla-fft(B)", run_full_mxu, run_full,
       decide="use_mxu_fft")
    ab("CFP stft  mxu(A) vs xla-fft(B)", run_stft_mxu, run_stft)

    spec0 = jnp.asarray(np.asarray(m._stft_mag(p, xl))[:, 1:-1])

    def interior(sp):
        v = jnp.maximum(sp, 0.0) ** m.g[0]
        if m.N % 2 == 0:
            full = jnp.concatenate((v, v[..., 1:-1][..., ::-1]), -1)
        else:
            full = jnp.concatenate((v, v[..., 1:][..., ::-1]), -1)
        return jnp.fft.rfft(full, axis=-1).real / np.sqrt(m.N)

    run_int = make_timed(interior, spec0, iters=4)

    def final(sp):
        return jnp.einsum("btn,kn->btk", sp, p["dft_final"],
                          preferred_element_type=jnp.float32)

    run_fin = make_timed(final, spec0, iters=4)

    for name, r in [("CFP full", run_full), ("stft_mag (rfft 8000)", run_stft),
                    ("interior sym+rfft", run_int), ("final dft matmul", run_fin)]:
        t = min(r() for _ in range(6))
        print(f"{name:22s} {t*1e3:8.2f} ms  ({AUDIO_S/t:7.0f} a-s/s)")


def main():
    print(f"probe: {probe():.1f} TFLOP/s bf16 (calm ~33 at n=4096)")
    pyramid_ab()
    cfp_decompose()
    recommend()


if __name__ == "__main__":
    main()
