"""Full benchmark sweep -> markdown table (the numbers behind RESULTS.md).

Run on the target accelerator: python tools/bench_all.py
Methodology per bench.py: chained in-graph iterations with a scalar data
dependency, full-output reductions (no DCE), scalar fetch to synchronize.
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

SR = 22050
BATCH = 32
SECONDS = 10.0
LENGTH = int(SR * SECONDS)


def timeit(fn, x, iters=5, repeats=3):
    @jax.jit
    def loop(xx):
        acc = 0.0
        for _ in range(iters):
            y = fn(xx * (1 + acc * 1e-20))
            acc = acc + jnp.sum(y)
        return acc

    float(loop(x))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(x))
        times.append(time.perf_counter() - t0)
    return min(times) / iters


def row(name, fn, x, audio_seconds):
    per = timeit(fn, x)
    rate = audio_seconds / per
    print(f"| {name} | {per*1e3:.2f} | {rate:,.0f} |")
    return rate


def main():
    from nnaudio_tpu import features, fast_mode

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    print(f"batch {BATCH} x {SECONDS:.0f}s @ {SR} Hz, fp32 HIGHEST unless noted")
    print("| transform | ms/batch | audio-s/s per chip |")
    print("|---|---|---|")

    x = jax.device_put(np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))
    a = BATCH * SECONDS

    st = features.STFT(n_fft=2048, hop_length=512, output_format="Magnitude", verbose=False)
    sp = dict(st.forward_params)
    row("STFT 2048/512 Magnitude", lambda xx: st._forward(sp, xx, output_format="Magnitude"), x, a)
    row("STFT 2048/512 Complex", lambda xx: st._forward(sp, xx, output_format="Complex"), x, a)
    with fast_mode():
        stf = features.STFT(n_fft=2048, hop_length=512, output_format="Magnitude", verbose=False)
        spf = dict(stf.forward_params)
        row("STFT 2048/512 Magnitude (fast bf16 mode)",
            lambda xx: stf._forward(spf, xx, output_format="Magnitude"), x, a)

    mel = features.MelSpectrogram(sr=SR, verbose=False)
    mp = dict(mel.forward_params)
    row("MelSpectrogram 2048/512/128", lambda xx: mel._forward(mp, xx), x, a)

    mf = features.MFCC(sr=SR, verbose=False)
    fp = dict(mf.forward_params)
    row("MFCC 20", lambda xx: mf._forward(fp, xx), x, a)

    gt = features.Gammatonegram(sr=SR, verbose=False)
    gp = dict(gt.forward_params)
    row("Gammatonegram 64", lambda xx: gt._forward(gp, xx), x, a)

    ch = features.ChromaSTFT(sr=SR, verbose=False)
    cp = dict(ch.forward_params)
    row("ChromaSTFT 12", lambda xx: ch._forward(cp, xx), x, a)

    q1 = features.CQT1992v2(sr=SR, verbose=False)
    q1p = dict(q1.forward_params)
    row("CQT1992v2 84 bins", lambda xx: q1._forward(
        q1p, xx, output_format="Magnitude", normalization_type="librosa"), x, a)

    q0 = features.CQT1992(sr=SR, fmin=220, n_bins=80, bins_per_octave=24)
    q0p = dict(q0.forward_params)
    row("CQT1992 80 bins", lambda xx: q0._forward(
        q0p, xx, output_format="Magnitude", normalization_type="librosa"), x, a)

    q2 = features.CQT2010v2(sr=SR, verbose=False)
    q2p = dict(q2.forward_params)
    row("CQT2010v2 84 bins (7-octave pyramid)", lambda xx: q2._forward(
        q2p, xx, output_format="Magnitude", normalization_type="librosa"), x, a)

    vq = features.VQT(sr=SR, gamma=2, verbose=False)
    vp = dict(vq.forward_params)
    row("VQT gamma=2", lambda xx: vq._forward(
        vp, xx, output_format="Magnitude", normalization_type="librosa"), x, a)

    X = jax.device_put(np.asarray(st._forward(sp, x, output_format="Complex")))
    ist = features.iSTFT(n_fft=2048, hop_length=512, verbose=False)
    ip = dict(ist.forward_params)
    row("iSTFT 2048/512", lambda XX: ist._forward(ip, XX, onesided=True, length=LENGTH), X, a)

    S = jax.device_put(np.abs(np.asarray(X[..., 0])))
    gl = features.Griffin_Lim(n_fft=2048, hop_length=512, n_iter=32)
    glp = dict(gl.forward_params)
    key = jax.random.PRNGKey(0)
    per = timeit(lambda SS: gl._forward(glp, SS, key), S, iters=2)
    print(f"| Griffin-Lim 32 iters | {per*1e3:.2f} | {a/per:,.0f} |")

    x16 = jax.device_put(np.random.RandomState(1).randn(8, 16000).astype(np.float32))
    cf = features.CFP()
    cfp_ = dict(cf.forward_params)
    # CFP runs in ~3ms/batch: needs >=20 chained iters or the ~25ms tunnel
    # dispatch roundtrip dominates (round-1 under-reported 1.2k for this)
    per = timeit(lambda xx: cf._forward(cfp_, xx), x16, iters=20)
    print(f"| CFP (fs=16k, 1s x 8) | {per*1e3:.2f} | {8/per:,.0f} |")


if __name__ == "__main__":
    main()
