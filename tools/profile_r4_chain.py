"""Round-4 on-chip A/B: parallel composed-cascade pyramid chain vs the
serial per-octave lowpass+decimate chain (config.use_parallel_chain).

The serial chain is ~6x the contraction FLOPs of the CQT2010v2 pyramid and
runs as 6-7 dependent, shrinking ops; the parallel chain trades ~1.4x dense
FLOPs for independent MXU-sized banded matmuls (+ tiny serial edge fixups).
Decides the use_parallel_chain auto policy (OFF until this wins — same
evidence standard as use_fused_pyramid). Also crosses the chain choice with
the fused-pyramid contraction, since the two compose.

Run on the TPU; interleaved repeats so shared-chip drift cancels.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import features, fast_mode
from nnaudio_tpu.config import set_use_fused_pyramid, set_use_parallel_chain

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
          f"B {b*1e3:7.2f} ms ({AUDIO_S/b:7.0f} a-s/s)  A/B {b/a:.2f}x",
          flush=True)
    if decide:
        _WINS.setdefault(decide, []).append(a < b)


def chain_ab():
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))
    for prec_name, ctx in [("HIGHEST", None), ("fast", fast_mode)]:
        for cls, kw, label in [
            (features.CQT2010v2, dict(), "CQT2010v2"),
            (features.VQT, dict(gamma=2), "VQT"),
        ]:
            for fused in (False, True):
                def build(par):
                    set_use_parallel_chain(par)
                    set_use_fused_pyramid(fused)
                    m = cls(sr=SR, hop_length=HOP, n_bins=84,
                            bins_per_octave=12, verbose=False, **kw)
                    p = dict(m.forward_params)

                    def f(xx):
                        return m._forward(p, xx, output_format="Magnitude")

                    return make_timed(f, x)

                if ctx is None:
                    run_p, run_s = build(True), build(False)
                else:
                    with ctx():
                        run_p, run_s = build(True), build(False)
                ab(f"{label:10s} {prec_name:7s} fusedpyr={int(fused)} "
                   "parallel(A) vs serial(B)", run_p, run_s,
                   decide="use_parallel_chain")
                set_use_parallel_chain(None)
                set_use_fused_pyramid(None)


def gl_highest_ab():
    """fp32 fused GL step (iter_precision='highest', new in round 4) vs the
    XLA fp32 chain. The bf16 variant measured 3,225 vs 2,756 a-s/s (1.17x)
    in round 3; this decides whether the fp32 variant earns its keep or gets
    the measured-parity retirement note."""
    from nnaudio_tpu import features
    from nnaudio_tpu.ops import framed_matmul
    from nnaudio_tpu.features import griffin_lim as glmod
    import jax

    n_fft, hop, n_iter = 2048, 512, 32
    bsz = 8
    x = np.random.RandomState(0).randn(bsz, LENGTH).astype(np.float32)
    st = features.STFT(n_fft=n_fft, hop_length=hop,
                       output_format="Magnitude", verbose=False)
    S = jax.device_put(np.asarray(st(x)))
    key = jax.random.PRNGKey(0)
    audio_s = bsz * 10.0

    def timed(gl, use_fused):
        p = {k: jnp.asarray(v) for k, v in gl.forward_params.items()}
        orig_plan = framed_matmul.gl_step_plan
        if not use_fused:
            framed_matmul.gl_step_plan = lambda *a, **k: None
        try:
            # fresh lambda per variant: jit's executable cache keys on
            # function equality (bound methods of the same object compare
            # equal) and would silently reuse the first-compiled graph
            fn = jax.jit(lambda pp, SS, kk: gl._forward(pp, SS, kk))
            float(jnp.sum(fn(p, S, key)))  # compile (trace under the patch)
        finally:
            framed_matmul.gl_step_plan = orig_plan

        def run():
            t0 = time.perf_counter()
            float(jnp.sum(fn(p, S, key)))
            return time.perf_counter() - t0

        return run

    global AUDIO_S
    prev_audio = AUDIO_S
    AUDIO_S = audio_s
    try:
        for iprec in ("highest", "default"):
            gl = features.Griffin_Lim(n_fft=n_fft, hop_length=hop,
                                      n_iter=n_iter, iter_precision=iprec)
            ab(f"GL {iprec:8s} fused(A) vs xla-chain(B)",
               timed(gl, True), timed(gl, False), repeats=4,
               decide=f"gl_fused_{iprec}")
    finally:
        AUDIO_S = prev_audio


def recommend():
    for policy, wins in _WINS.items():
        n = sum(wins)
        verdict = ("auto should take the A path" if n == len(wins) else
                   "auto should take the B path" if n == 0 else
                   f"mixed ({n}/{len(wins)} A wins) — set auto per config")
        print(f"RECOMMENDATION [{policy}]: A wins {n}/{len(wins)} -> "
              f"{verdict}")


def main():
    print(f"probe: {probe():.1f} TFLOP/s bf16 (calm ~33 at n=4096)")
    chain_ab()
    gl_highest_ab()
    recommend()


if __name__ == "__main__":
    main()
