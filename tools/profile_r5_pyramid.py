"""Round-5 on-chip decomposition: where does CQT2010v2's time actually go?

The round-4b A/Bs killed both whole-structure candidates (fused pyramid
0.84-0.86x, parallel chain 0.19-0.25x), yet fast-mode CQT2010v2 sits at
~49k audio-s/s vs CQT1992v2's ~79k despite doing ~3.6x fewer real FLOPs.
This profiler splits the forward into its serial stages and times each on
the chip, then times two cheap per-level candidates:

  stages:  early-downsample | decimation chain | per-level projections
           (no assembly) | everything-post-chain (projections + concat +
           scale + magnitude) | full forward
  per level: projection k alone (hop 512/2^k on the 2^k-decimated signal)
             — is the tiny-hop tail (hop 16/8 -> 16/32-term XLA
             hop-decomposition) the sink?
  candidates:
    C1  per-level fused framed_magnitude (Magnitude path only): sqrt
        epilogue + normalization fold into each level's Pallas kernel
        instead of pair-concat-sqrt over the assembled (B, 84+, T) stack.
    C2  one-shot assembly: collect all levels then concat ONCE (the loop
        currently concat-accumulates — 6 growing copies).

Timing per the repo's tunnel rules (RESULTS.md "Measurement methodology"):
chained iterations inside one jit, scalar carry, full outputs consumed,
host fetch to sync. Interleaved repeats so shared-chip drift cancels.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import features, fast_mode
from nnaudio_tpu.core.resample import downsample_by_n

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
    float(loop(*args))  # compile
    print(f"  [compiled {label or getattr(fn, '__name__', '?')} "
          f"in {time.perf_counter() - t0:.0f}s]", flush=True)
    def run():
        t0 = time.perf_counter()
        float(loop(*args))
        return (time.perf_counter() - t0) / iters
    return run


def best(run, repeats=6):
    return min(run() for _ in range(repeats))


def row(name, t, extra=""):
    print(f"{name:42s} {t*1e3:8.2f} ms  ({AUDIO_S/t:7.0f} a-s/s) {extra}",
          flush=True)


def decompose():
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))
    with fast_mode():
        m = features.CQT2010v2(sr=SR, hop_length=HOP, n_bins=84,
                               bins_per_octave=12, verbose=False)
        p = dict(m.forward_params)
        F = int(m.downsample_factor)
        early_active = m.earlydownsample
        print(f"earlydownsample={early_active} factor={F} "
              f"n_octaves={m.n_octaves} n_fft={m.n_fft} "
              f"hop_eff={m.hop_length}", flush=True)

        # ---- stage inputs ------------------------------------------------
        def early(xx):
            return downsample_by_n(xx, p["early_downsample_filter"], F) \
                if early_active else xx

        x_e = jax.device_put(np.asarray(early(x)))
        levels_np, hops = m._pyramid_chain(p, x_e)
        levels = [jax.device_put(np.asarray(lv)) for lv in levels_np]
        print("level shapes:", [tuple(lv.shape) for lv in levels],
              "hops:", hops, flush=True)

        # ---- stage timings -----------------------------------------------
        runs = {}
        runs["full forward (Magnitude)"] = make_timed(
            lambda xx: m._forward(p, xx, output_format="Magnitude"), x,
            label="full")
        if early_active:
            runs["early downsample only"] = make_timed(early, x, label="early")
        runs["decimation chain only"] = make_timed(
            lambda xx: tuple(m._pyramid_chain(p, xx)[0]), x_e, label="chain")

        def post_chain(lv0, *rest):
            lvs = (lv0,) + rest
            real, imag = m._octave_cqt(p, lvs[0], hops[0])
            for lv, h in zip(lvs[1:], hops[1:]):
                r1, i1 = m._octave_cqt(p, lv, h)
                real = jnp.concatenate((r1, real), axis=1)
                imag = jnp.concatenate((i1, imag), axis=1)
            real = real[:, -m.n_bins:] * m.downsample_factor
            imag = imag[:, -m.n_bins:] * m.downsample_factor
            scale = jnp.sqrt(p["lenghts"])[None, :, None]
            return jnp.sqrt(real * real + imag * imag) * scale

        runs["post-chain (proj+concat+mag)"] = make_timed(post_chain, *levels, label="post_chain")

        def proj_only(lv0, *rest):
            outs = []
            for lv, h in zip((lv0,) + rest, hops):
                outs.extend(m._octave_cqt(p, lv, h))
            return tuple(outs)

        runs["projections only (no assembly)"] = make_timed(proj_only, *levels, label="proj_only")

        # interleave the stage measurements so drift cancels
        times = {k: [] for k in runs}
        for _ in range(6):
            for k, r in runs.items():
                times[k].append(r())
        for k in runs:
            row(k, min(times[k]))

        # ---- per-level projections ----------------------------------------
        for k, (lv, h) in enumerate(zip(levels, hops)):
            r = make_timed(lambda xx, hh=h: m._octave_cqt(p, xx, hh), lv,
                           iters=8, label=f"level{k}")
            row(f"  projection level {k} (hop {h})", best(r),
                extra=f"len={lv.shape[-1]}")

        # ---- candidate C1: per-level fused magnitude ----------------------
        from nnaudio_tpu.ops.dispatch import framed_magnitude
        from nnaudio_tpu.features.cqt import _center_pad

        def per_level_fused_mag(lv0, *rest):
            lvs = (lv0,) + rest
            mags = []
            for lv, h in zip(lvs, hops):
                xx = _center_pad(lv, m.n_fft // 2, m.pad_mode)
                mags.append(framed_magnitude(
                    xx, p["cqt_kernels_real"], p["cqt_kernels_imag"], h))
            mag = jnp.concatenate(mags[::-1], axis=1)[:, -m.n_bins:]
            scale = jnp.sqrt(p["lenghts"])[None, :, None]
            return mag * m.downsample_factor * scale

        r_c1 = make_timed(per_level_fused_mag, *levels, label="C1")
        # exactness vs the current path
        a = np.asarray(post_chain(*levels))
        b = np.asarray(per_level_fused_mag(*levels))
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-30)
        ta, tb = [], []
        for _ in range(6):
            ta.append(r_c1())
            tb.append(runs["post-chain (proj+concat+mag)"]())
        row("C1 per-level fused magnitude", min(ta),
            extra=f"vs post-chain {min(tb)*1e3:.2f} ms, rel-err {err:.1e}")

        # ---- candidate C2: one-shot concat assembly -----------------------
        def post_chain_oneshot(lv0, *rest):
            lvs = (lv0,) + rest
            rs, js = [], []
            for lv, h in zip(lvs, hops):
                r1, i1 = m._octave_cqt(p, lv, h)
                rs.append(r1)
                js.append(i1)
            real = jnp.concatenate(rs[::-1], axis=1)[:, -m.n_bins:]
            imag = jnp.concatenate(js[::-1], axis=1)[:, -m.n_bins:]
            real = real * m.downsample_factor
            imag = imag * m.downsample_factor
            scale = jnp.sqrt(p["lenghts"])[None, :, None]
            return jnp.sqrt(real * real + imag * imag) * scale

        r_c2 = make_timed(post_chain_oneshot, *levels, label="C2")
        b2 = np.asarray(post_chain_oneshot(*levels))
        err2 = np.abs(a - b2).max() / max(np.abs(a).max(), 1e-30)
        row("C2 one-shot concat assembly", best(r_c2),
            extra=f"rel-err {err2:.1e}")


def main():
    print(f"probe: {probe():.1f} TFLOP/s bf16 (calm ~33 at n=4096)", flush=True)
    decompose()


if __name__ == "__main__":
    main()
