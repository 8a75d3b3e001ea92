"""End-to-end on-chip verification drive (the /verify recipe as a script).

Runs on whatever backend JAX resolves (the real TPU chip under axon; CPU
elsewhere) and checks the package surface against independent numpy oracles:

    python tools/verify_tpu.py

Covers: STFT complex/magnitude vs numpy-rfft (incl. the generalized-envelope
speech hop 160), iSTFT and STFT.inverse round-trips, fast-mode numerics
bounds, Mel/CQT finiteness + frozen-oracle spot check, trainable gradients,
Griffin-Lim reconstruction SNR, and checkpoint round-trip. Exits nonzero on
the first failure.
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")

FAILURES = []


def check(name, ok, detail=""):
    status = "ok" if ok else "FAIL"
    print(f"[{status}] {name} {detail}")
    if not ok:
        FAILURES.append(name)


def main():
    import jax
    import jax.numpy as jnp
    from scipy.signal import get_window

    from nnaudio_tpu import fast_mode, features
    from nnaudio_tpu.utils.checkpoint import load_params, save_params

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32)

    def np_stft(sig, n_fft, hop, center=True):
        xp = np.pad(sig, n_fft // 2, mode="reflect") if center else sig
        T = (len(xp) - n_fft) // hop + 1
        frames = np.stack([xp[t * hop : t * hop + n_fft] for t in range(T)])
        return np.fft.rfft(frames * get_window("hann", n_fft, fftbins=True),
                           axis=1)

    # STFT complex vs numpy-rfft oracle
    st = features.STFT(n_fft=1024, hop_length=256, output_format="Complex",
                       verbose=False)
    S = np.asarray(st(x)[0])
    F = np_stft(x, 1024, 256)
    err = np.abs(S - np.stack([F.real.T, F.imag.T], -1)).max()
    check("stft_complex_vs_rfft", err < 1e-3, f"max_abs_err={err:.2e}")

    # generalized envelope: speech hop 160 — batched past the fused-kernel
    # work gate (>=1024 total frames) so this drives the Pallas repack path
    xb = rng.standard_normal((8, 32000)).astype(np.float32)
    st160 = features.STFT(n_fft=512, hop_length=160,
                          output_format="Magnitude", verbose=False)
    m160 = np.asarray(st160(xb))
    errs = [np.abs(m160[i] - np.abs(np_stft(xb[i], 512, 160)).T).max()
            for i in (0, 7)]
    err = max(errs)
    check("stft_hop160_magnitude_fused", err < 1e-3, f"max_abs_err={err:.2e}")

    # fast-mode numerics bound
    with fast_mode():
        stf = features.STFT(n_fft=2048, hop_length=512,
                            output_format="Magnitude", verbose=False)
        mf = np.asarray(stf(x)[0])
    F2 = np.abs(np_stft(x, 2048, 512)).T
    rel = np.abs(mf - F2).max() / F2.max()
    check("stft_fast_mode_rel_err", rel < 1e-2, f"rel_err={rel:.2e}")

    # round-trips
    st2 = features.STFT(n_fft=1024, hop_length=256, output_format="Complex",
                        iSTFT=True, verbose=False)
    rec = np.asarray(st2.inverse(st2(x), length=len(x)))[0]
    err = np.abs(rec - x).max()
    check("stft_inverse_roundtrip", err < 1e-3, f"max_abs_err={err:.2e}")

    ist = features.iSTFT(n_fft=1024, hop_length=256, verbose=False)
    rec = np.asarray(ist(st2(x), onesided=True, length=len(x)))[0]
    err = np.abs(rec - x).max()
    check("istft_roundtrip", err < 1e-3, f"max_abs_err={err:.2e}")

    # Mel / CQT sanity
    mel = np.asarray(features.MelSpectrogram(sr=22050, verbose=False)(x))
    check("mel_finite", bool(np.isfinite(mel).all()), f"shape={mel.shape}")
    cqt = np.asarray(features.CQT1992v2(sr=22050, verbose=False)(x))
    check("cqt_finite", bool(np.isfinite(cqt).all()), f"shape={cqt.shape}")

    # fused pyramid (round 3b): on-chip fused == per-octave loop
    from nnaudio_tpu.config import set_use_fused_pyramid, set_use_mxu_fft

    vq = features.VQT(sr=22050, hop_length=512, n_bins=84, gamma=2,
                      verbose=False)
    xb2 = rng.standard_normal((2, 44100)).astype(np.float32)
    set_use_fused_pyramid(True)
    vf = np.asarray(vq(xb2))
    set_use_fused_pyramid(False)
    vl = np.asarray(vq(xb2))
    set_use_fused_pyramid(None)
    rel = np.abs(vf - vl).max() / (np.abs(vl).max() + 1e-12)
    check("vqt_fused_pyramid_vs_loop", rel < 1e-4, f"rel_err={rel:.2e}")

    # MXU-staged rfft (round 3b) vs numpy
    from nnaudio_tpu.ops.mxu_fft import rfft_mxu

    xr = rng.standard_normal((4, 8000)).astype(np.float32)
    pair = rfft_mxu(jnp.asarray(xr))
    want = np.fft.rfft(xr.astype(np.float64), axis=-1)
    scale = np.abs(want).max()
    err = max(np.abs(np.asarray(pair[0]) - want.real).max(),
              np.abs(np.asarray(pair[1]) - want.imag).max()) / scale
    check("mxu_rfft_vs_numpy", err < 1e-4, f"rel_err={err:.2e}")

    # CFP end-to-end with the MXU FFT forced on vs off
    cfp = features.Combined_Frequency_Periodicity(fs=16000, hop_length=320)
    xc = rng.standard_normal((1, 32000)).astype(np.float32)
    set_use_mxu_fft(True)
    za = [np.asarray(v) for v in cfp(xc)]
    set_use_mxu_fft(False)
    zb = [np.asarray(v) for v in cfp(xc)]
    set_use_mxu_fft(None)
    rel = max(np.abs(a - b).max() / max(np.abs(b).max(), 1.0)
              for a, b in zip(za, zb))
    check("cfp_mxu_fft_vs_xla_fft", rel < 1e-3, f"rel_err={rel:.2e}")

    # trainable gradients
    st3 = features.STFT(n_fft=512, hop_length=256, output_format="Magnitude",
                        trainable=True, verbose=False)
    g = jax.grad(lambda p: jnp.sum(st3.apply(p, jnp.asarray(x[:8000]))))(
        st3.trainable_params())
    check("trainable_grads_finite",
          all(bool(jnp.isfinite(v).all()) for v in g.values()))

    # Griffin-Lim reconstruction (spec-domain SNR criterion)
    t = np.arange(16000) / 16000.0
    tone = (np.sin(2 * np.pi * 440 * t)
            + 0.5 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    stm = features.STFT(n_fft=1024, hop_length=256,
                        output_format="Magnitude", verbose=False)
    Sm = stm(tone[None])
    gl = features.Griffin_Lim(n_fft=1024, hop_length=256, n_iter=32)
    recon = np.asarray(gl(Sm, key=jax.random.PRNGKey(42)))[0]
    Sr = np.asarray(stm(recon[None]))[0]
    Si = np.asarray(Sm)[0][:, : Sr.shape[1]]
    rel = np.linalg.norm(Sr[:, : Si.shape[1]] - Si) / np.linalg.norm(Si)
    check("griffin_lim_spec_err", rel < 0.15, f"rel_spec_err={rel:.3f}")

    # fused GL step (TPU-only path) must be the same fixed-point map as
    # the XLA loop — tail included (round-3c envelope/re-pad fixes)
    from nnaudio_tpu.config import set_use_pallas

    gl2 = features.Griffin_Lim(n_fft=1024, hop_length=256, n_iter=2)
    rec_fused = np.asarray(gl2(Sm, key=jax.random.PRNGKey(7)))[0]
    set_use_pallas(False)
    try:
        rec_xla = np.asarray(gl2(Sm, key=jax.random.PRNGKey(7)))[0]
    finally:
        set_use_pallas(True)
    scl = np.abs(rec_xla).max()
    d_all = np.abs(rec_fused - rec_xla).max() / scl
    d_tail = np.abs(rec_fused[-1024:] - rec_xla[-1024:]).max() / scl
    check("griffin_lim_fused_semantics", d_all < 3e-2 and d_tail < 3e-2,
          f"max_rel={d_all:.2e} tail={d_tail:.2e}")

    # streaming (round 3c): chunked == offline center=False on-chip
    from nnaudio_tpu import streaming

    sN, sH = 1024, 256
    xs = np.random.RandomState(9).randn(2, sH * 120).astype(np.float32)
    sstft = streaming.StreamingSTFT(n_fft=sN, hop_length=sH)
    sgot = np.concatenate([np.asarray(f) for f in sstft.stream(xs, sH * 24)],
                          axis=2)
    swant = np.asarray(features.STFT(n_fft=sN, hop_length=sH, center=False,
                                     output_format="Magnitude",
                                     verbose=False)(xs))
    srel = np.abs(sgot - swant).max() / np.abs(swant).max()
    check("streaming_stft_vs_offline",
          sgot.shape == swant.shape and srel < 1e-4, f"rel_err={srel:.2e}")

    # parallel composed-cascade chain (round 4) == serial chain on-chip
    from nnaudio_tpu.config import set_use_parallel_chain

    cq = features.CQT2010v2(sr=22050, hop_length=512, n_bins=84,
                            bins_per_octave=12, verbose=False)
    xb3 = rng.standard_normal((2, 44100 + 977)).astype(np.float32)
    want_ser = np.asarray(cq(xb3))
    set_use_parallel_chain(True)
    try:
        got_par = np.asarray(cq(xb3))
    finally:
        set_use_parallel_chain(None)
    rel = np.abs(got_par - want_ser).max() / (np.abs(want_ser).max() + 1e-12)
    check("cqt2010v2_parallel_chain_vs_serial", rel < 1e-4,
          f"rel_err={rel:.2e}")

    # fp32 fused GL step (round 4): same fixed-point map as the XLA fp32
    # loop to fp32 tightness (first-ever on-chip run of this kernel)
    glh = features.Griffin_Lim(n_fft=1024, hop_length=256, n_iter=2,
                               iter_precision="highest")
    rec_fh = np.asarray(glh(Sm, key=jax.random.PRNGKey(7)))[0]
    set_use_pallas(False)
    try:
        rec_xh = np.asarray(glh(Sm, key=jax.random.PRNGKey(7)))[0]
    finally:
        set_use_pallas(True)
    d_h = np.abs(rec_fh - rec_xh).max() / np.abs(rec_xh).max()
    check("griffin_lim_fused_fp32_semantics", d_h < 5e-4,
          f"max_rel={d_h:.2e}")

    # streaming fuse=True (round 4): gate-overridden Pallas steps must be
    # exact vs the offline transform on-chip (serving chunks sit below the
    # workload gate, so this path never ran before)
    sfused = streaming.StreamingSTFT(n_fft=sN, hop_length=sH, fuse=True)
    fgot = np.concatenate([np.asarray(f) for f in sfused.stream(xs, sH * 24)],
                          axis=2)
    frel = np.abs(fgot - swant).max() / np.abs(swant).max()
    check("streaming_fused_vs_offline",
          fgot.shape == swant.shape and frel < 2e-3, f"rel_err={frel:.2e}")

    # real-audio frozen oracle (round 4) on-chip
    gt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "ground-truths",
        "real_audio_oracles.npz")
    if os.path.exists(gt):
        with np.load(gt) as z:
            ra_x, ra_mel = z["input"], z["mel_128"]
        mel_l = features.MelSpectrogram(sr=22050, n_fft=1024, hop_length=256,
                                        n_mels=128, verbose=False)
        got = np.asarray(mel_l(ra_x[None]))
        rel = np.abs(got - ra_mel).max() / np.abs(ra_mel).max()
        check("real_audio_mel_vs_frozen_reference", rel < 2e-3,
              f"rel_err={rel:.2e}")
    else:
        # never skip silently: the drive's accounting must show the gap
        check("real_audio_mel_vs_frozen_reference", False,
              f"MISSING {gt} — regenerate with tools/make_audio_fixture.py")

    # inverse CQT (canonical-dual synthesis) + magnitude-only GL-CQT
    t_ax = np.arange(22050) / 22050
    tones = sum(np.sin(2 * np.pi * fq * t_ax + i)
                for i, fq in enumerate([110, 220, 440, 660])
                ).astype(np.float32)[None]
    icq = features.CQT1992v2(sr=22050, fmin=55, n_bins=48, hop_length=128,
                             output_format="Complex", verbose=False)
    xr = np.asarray(icq.inverse(icq(tones), length=tones.shape[-1]))
    core = slice(4096, tones.shape[-1] - 4096)
    snr = 10 * np.log10(((tones[:, core] ** 2).sum()
                         / ((xr[:, core] - tones[:, core]) ** 2).sum()))
    check("icqt_roundtrip_snr", snr > 40, f"snr={snr:.1f}dB")

    ipyr = features.CQT2010v2(sr=22050, fmin=55, n_bins=48,
                              bins_per_octave=12, hop_length=128,
                              earlydownsample=False,
                              output_format="Complex", verbose=False)
    xrp = np.asarray(ipyr.inverse(ipyr(tones), length=tones.shape[-1]))
    snr = 10 * np.log10(((tones[:, core] ** 2).sum()
                         / ((xrp[:, core] - tones[:, core]) ** 2).sum()))
    check("icqt_pyramid_roundtrip_snr", snr > 40, f"snr={snr:.1f}dB")

    from nnaudio_tpu.streaming import StreamingInverseCQT

    off48 = features.CQT1992v2(sr=22050, fmin=55, n_bins=48, hop_length=128,
                               center=False, output_format="Complex",
                               verbose=False)
    Xs = off48(tones[:, :128 * 80])
    want_s = np.asarray(off48.inverse(Xs))
    sicq = StreamingInverseCQT(sr=22050, fmin=55, n_bins=48, hop_length=128,
                               verbose=False)
    st_s = sicq.init_state(1)
    parts = []
    for a in range(0, Xs.shape[2], 7):
        st_s, o = sicq.step(st_s, Xs[:, :, a:a + 7])
        parts.append(np.asarray(o))
    parts.append(np.asarray(sicq.flush(st_s)))
    got_s = np.concatenate(parts, axis=-1)
    rel = np.abs(got_s - want_s).max() / max(np.abs(want_s).max(), 1e-12)
    check("streaming_icqt_vs_offline", rel < 1e-5, f"rel_err={rel:.2e}")

    glc = features.GriffinLimCQT(sr=22050, fmin=55, n_bins=48,
                                 hop_length=128, n_iter=32, verbose=False)
    Smag = np.asarray(icq(tones, output_format="Magnitude"))
    xg = np.asarray(glc(Smag, key=jax.random.PRNGKey(1),
                        length=tones.shape[-1]))
    S2 = np.asarray(icq(xg, output_format="Magnitude"))
    m = min(Smag.shape[2], S2.shape[2])
    rel = (np.linalg.norm(S2[:, :, :m] - Smag[:, :, :m])
           / np.linalg.norm(Smag))
    check("griffinlim_cqt_spectral_convergence", rel < 0.2,
          f"rel={rel:.3f}")

    # processing tier (round 4): resample vs scipy, phase-locked stretch
    # amplitude, pitch-shift frequency — the STFT->vocoder->iSTFT chain
    # and the banded polyphase matmul driven end-to-end on this backend
    from scipy.signal import resample_poly as sp_resample_poly

    tone = np.sin(2 * np.pi * 440 * t_ax).astype(np.float32)[None]
    y16 = np.asarray(features.resample(tone, 22050, 16000))
    want16 = sp_resample_poly(np.asarray(tone, np.float64), 320, 441, axis=-1)
    rel = (np.abs(y16 - want16).max() / np.abs(want16).max())
    check("resample_poly_vs_scipy", rel < 1e-4, f"rel_err={rel:.2e}")

    ts = features.TimeStretch(n_fft=1024, hop_length=256)
    ys = np.asarray(ts(tone, rate=0.8))
    core_s = slice(2048, ys.shape[-1] - 2048)
    rms = float(np.sqrt((ys[:, core_s] ** 2).mean()))
    ok_len = ys.shape[-1] == round(tone.shape[-1] / 0.8)
    check("time_stretch_locked_amplitude", ok_len and abs(rms - 0.707) < 0.08,
          f"rms={rms:.3f} (want 0.707) len_ok={ok_len}")

    ps = features.PitchShift(sr=22050, n_fft=1024, hop_length=256)
    yp = np.asarray(ps(tone, n_steps=7))
    Fp = np.abs(np.fft.rfft(yp[0] * np.hanning(yp.shape[-1])))
    got_f = Fp.argmax() * 22050 / yp.shape[-1]
    want_f = 440 * 2 ** (7 / 12)
    check("pitch_shift_frequency",
          yp.shape == tone.shape and abs(got_f - want_f) < 4,
          f"freq={got_f:.1f} (want {want_f:.1f})")

    # checkpoint round-trip (npz)
    import tempfile

    d = tempfile.mkdtemp()
    p = os.path.join(d, "ck.npz")
    save_params(p, st3.params)
    lp = load_params(p)
    check("checkpoint_roundtrip",
          all(np.array_equal(np.asarray(st3.params[k]), lp[k]) for k in lp))

    print(f"\n{len(FAILURES)} failure(s)" if FAILURES else "\nall checks passed")
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
