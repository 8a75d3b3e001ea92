"""Griffin-Lim phase recovery: reconstruction quality on structured signals.

The reference has no numerical GL test; acceptance here is reconstruction SNR
on a magnitude spectrogram of a known harmonic signal (SURVEY.md §7: "Griffin-
Lim parity: acceptance is reconstruction SNR, not bitwise match").
"""
import numpy as np
import jax

from nnaudio_tpu import features


def _sine_mixture(sr=16000, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    x = (np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 880 * t)
         + 0.25 * np.sin(2 * np.pi * 1320 * t))
    return (x / np.abs(x).max()).astype(np.float32)


def test_griffin_lim_reconstruction_snr():
    n_fft, hop = 1024, 256
    x = _sine_mixture()
    stft = features.STFT(n_fft=n_fft, hop_length=hop, output_format="Magnitude",
                         verbose=False)
    S = stft(x[None])
    gl = features.Griffin_Lim(n_fft=n_fft, hop_length=hop, n_iter=32)
    rec = np.asarray(gl(S, key=jax.random.PRNGKey(42)))[0]

    # compare magnitude spectrograms (phase-free criterion)
    S_rec = np.asarray(stft(rec[None]))[0]
    S_in = np.asarray(S)[0][:, : S_rec.shape[1]]
    S_rec = S_rec[:, : S_in.shape[1]]
    err = np.linalg.norm(S_rec - S_in) / np.linalg.norm(S_in)
    assert err < 0.15, err


def test_griffin_lim_deterministic_given_key():
    x = _sine_mixture(dur=0.25)
    stft = features.STFT(n_fft=512, hop_length=128, output_format="Magnitude",
                         verbose=False)
    S = stft(x[None])
    gl = features.Griffin_Lim(n_fft=512, hop_length=128, n_iter=8)
    a = np.asarray(gl(S, key=jax.random.PRNGKey(0)))
    b = np.asarray(gl(S, key=jax.random.PRNGKey(0)))
    c = np.asarray(gl(S, key=jax.random.PRNGKey(1)))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_griffin_lim_output_length():
    gl = features.Griffin_Lim(n_fft=512, hop_length=128, n_iter=2)
    S = np.abs(np.random.RandomState(0).randn(2, 257, 21)).astype(np.float32)
    out = np.asarray(gl(S))
    assert out.shape == (2, 20 * 128)


def test_griffin_lim_center_false():
    """center=False parity: output length n_fft + hop*(T-1); loop must keep
    frame counts consistent without the center pad."""
    gl = features.Griffin_Lim(n_fft=512, hop_length=128, n_iter=4,
                              center=False)
    S = np.abs(np.random.RandomState(3).randn(1, 257, 9)).astype(np.float32)
    out = np.asarray(gl(S))
    assert out.shape == (1, 512 + 128 * 8)
    assert np.isfinite(out).all()


def test_griffin_lim_bf16_carries_match_fp32_snr():
    """iter_precision='default' stores the loop carries in bf16 (round 3:
    halves the loop's elementwise + kernel-input HBM traffic). GL is a
    fixed-point projection, so per-iteration rounding must not degrade the
    reconstruction: both precisions must land at the same spectral error."""
    n_fft, hop = 1024, 256
    x = _sine_mixture()
    stft = features.STFT(n_fft=n_fft, hop_length=hop, output_format="Magnitude",
                         verbose=False)
    S = stft(x[None])

    def spec_err(rec):
        S_rec = np.asarray(stft(rec[None]))[0]
        S_in = np.asarray(S)[0][:, : S_rec.shape[1]]
        S_rec = S_rec[:, : S_in.shape[1]]
        return np.linalg.norm(S_rec - S_in) / np.linalg.norm(S_in)

    errs = {}
    for ip in ("default", "highest"):
        gl = features.Griffin_Lim(n_fft=n_fft, hop_length=hop, n_iter=32,
                                  iter_precision=ip)
        rec = np.asarray(gl(S, key=jax.random.PRNGKey(42)))[0]
        errs[ip] = spec_err(rec)
    assert errs["default"] < 0.15, errs
    assert errs["highest"] < 0.15, errs
    # same quality class (reference round-2 measurement: 0.0895 vs 0.0896)
    assert abs(errs["default"] - errs["highest"]) < 0.02, errs


def test_gl_fused_gate_fp32_retired(monkeypatch):
    """iter_precision='highest' keeps the XLA loop under EVERY ambient
    setting: the fp32 fused step measured 0.86x the XLA chain on-chip
    (round-4b A/B, tools/profile_r4_chain.py) and is retired from auto
    dispatch — it stays reachable only via an explicit _forward_fused
    call (exercised in tests/test_ops.py)."""
    from nnaudio_tpu import config as cfgmod
    from nnaudio_tpu.config import set_matmul_precision
    from nnaudio_tpu.ops import framed_matmul

    calls = []
    monkeypatch.setattr(cfgmod, "on_tpu", lambda: True)
    monkeypatch.setattr(framed_matmul, "gl_step_plan",
                        lambda *a, **k: calls.append(k) or None)
    gl = features.Griffin_Lim(n_fft=512, hop_length=128, n_iter=1,
                              iter_precision="highest")
    S = np.abs(np.random.RandomState(0).randn(1, 257, 40)).astype(np.float32)
    prev = cfgmod.get_config().matmul_precision
    try:
        for ambient in ("highest", "default"):
            set_matmul_precision(ambient)
            gl(S)
            assert not calls, (f"iter 'highest' under ambient {ambient!r} "
                               "must keep the XLA loop (fp32 fused retired)")
    finally:
        set_matmul_precision(prev)


def test_gl_fused_gate_respects_tf32(monkeypatch):
    """tensorfloat32 asks ~1e-4 iteration numerics; the fused step's bf16
    carries deliver ~2e-3, so the tf32 setting must keep the XLA loop
    (round-3c gate — same contract as the analysis/synthesis kernels)."""
    from nnaudio_tpu import config as cfgmod
    from nnaudio_tpu.config import set_matmul_precision
    from nnaudio_tpu.ops import framed_matmul

    calls = []
    monkeypatch.setattr(cfgmod, "on_tpu", lambda: True)
    # force the XLA loop either way so the test runs on CPU; only the
    # *consultation* of the plan (the gate being open) is observed
    monkeypatch.setattr(framed_matmul, "gl_step_plan",
                        lambda *a, **k: calls.append(a))
    gl = features.Griffin_Lim(n_fft=512, hop_length=128, n_iter=1)
    S = np.abs(np.random.RandomState(0).randn(1, 257, 40)).astype(np.float32)
    gl(S)
    assert calls, "default precision: fused gate should be consulted"
    calls.clear()
    prev = cfgmod.get_config().matmul_precision
    set_matmul_precision("tensorfloat32")
    try:
        gl(S)
        assert not calls, "tensorfloat32 must bypass the fused bf16 loop"
    finally:
        set_matmul_precision(prev)
