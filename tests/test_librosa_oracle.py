"""Librosa-as-live-oracle tier: the reference's entire accuracy contract.

The reference suite validates against librosa at fixed tolerances
(`/root/reference/Installation/tests/test_stft.py:59-113`, `tests_mel.py:27-41`,
`test_vqt.py:45-61`); this file asserts the SAME tolerances against the same
oracle calls. librosa is not installable in the zero-egress build image, so
the whole module skips there (`pytest.importorskip`) — install the
``nnaudio-tpu[test-librosa]`` extra to run it. The build image's substitutes
(numpy-rfft oracles, frozen reference ground truths, and the live torch
reference package — itself librosa-validated) cover everything here except
``librosa.vqt`` for gamma > 0, which only this tier exercises.

Max-abs-err numbers this tier reports feed the BASELINE.md "max abs err vs
librosa (CPU)" cell (see RESULTS.md).
"""
import numpy as np
import pytest

librosa = pytest.importorskip("librosa")

from nnaudio_tpu import features  # noqa: E402


@pytest.fixture(scope="module")
def example():
    # a librosa-bundled example clip, as the reference uses; fall back to a
    # deterministic chirp if the example download cache is unavailable
    try:
        y, sr = librosa.load(librosa.ex("choice"), duration=5)
    except Exception:
        sr = 22050
        t = np.arange(5 * sr) / sr
        y = np.sin(2 * np.pi * (220 + 300 * t) * t).astype(np.float32)
    return y.astype(np.float32), sr


STFT_PARAMS = [(4096, 1024, "hann"), (1024, 256, "hann"), (512, 128, "hann"),
               (2048, 512, "blackman")]
STFT_WIN_PARAMS = [(4096, 2048, 1024), (1024, 512, 256), (512, 256, 128)]


@pytest.mark.parametrize("n_fft,hop,window", STFT_PARAMS)
def test_stft_complex_vs_librosa(example, n_fft, hop, window):
    y, _ = example
    st = features.STFT(n_fft=n_fft, hop_length=hop, window=window,
                       output_format="Complex", verbose=False)
    X = np.asarray(st(y[None]))[0]
    X_lib = librosa.stft(y, n_fft=n_fft, hop_length=hop, window=window)
    # reference tolerance: rtol=1e-1, atol=1e-1 (test_stft.py:65-67)
    assert np.allclose(X[..., 0], X_lib.real, rtol=1e-1, atol=1e-1)
    assert np.allclose(X[..., 1], X_lib.imag, rtol=1e-1, atol=1e-1)
    print(f"max_abs_err stft n{n_fft} h{hop} {window}: "
          f"{max(np.abs(X[..., 0] - X_lib.real).max(), np.abs(X[..., 1] - X_lib.imag).max()):.3e}")


@pytest.mark.parametrize("n_fft,win_length,hop", STFT_WIN_PARAMS)
def test_stft_complex_winlength_vs_librosa(example, n_fft, win_length, hop):
    y, _ = example
    st = features.STFT(n_fft=n_fft, win_length=win_length, hop_length=hop,
                       output_format="Complex", verbose=False)
    X = np.asarray(st(y[None]))[0]
    X_lib = librosa.stft(y, n_fft=n_fft, win_length=win_length,
                         hop_length=hop)
    # reference tolerance: rtol=1e-3, atol=1e-3 (test_stft.py:82-84)
    assert np.allclose(X[..., 0], X_lib.real, rtol=1e-3, atol=1e-3)
    assert np.allclose(X[..., 1], X_lib.imag, rtol=1e-3, atol=1e-3)


def test_stft_magnitude_vs_librosa(example):
    y, _ = example
    st = features.STFT(n_fft=2048, hop_length=512, output_format="Magnitude",
                       verbose=False)
    X = np.asarray(st(y[None]))[0]
    X_lib, _ = librosa.core.magphase(librosa.stft(y, n_fft=2048,
                                                  hop_length=512))
    # reference tolerance: rtol=1e-1, atol=1e-1 (test_stft.py:96)
    assert np.allclose(X, X_lib, rtol=1e-1, atol=1e-1)
    print(f"max_abs_err stft_magnitude: {np.abs(X - X_lib).max():.3e}")


def test_stft_phase_vs_librosa(example):
    y, _ = example
    st = features.STFT(n_fft=2048, hop_length=512, output_format="Phase",
                       verbose=False)
    P = np.asarray(st(y[None]))[0]
    _, ph = librosa.core.magphase(librosa.stft(y, n_fft=2048, hop_length=512))
    # reference metric: mean abs err < 2e-2 on cos/sin (test_stft.py:107-113)
    assert np.mean(np.abs(np.cos(P) - ph.real)) < 2e-2
    assert np.mean(np.abs(np.sin(P) - ph.imag)) < 2e-2


@pytest.mark.parametrize("n_fft,win_length", [(4096, 2048), (2048, 1024),
                                              (1024, 512)])
def test_melspectrogram_vs_librosa(example, n_fft, win_length):
    y, sr = example
    mel = features.MelSpectrogram(sr=sr, n_fft=n_fft, win_length=win_length,
                                  hop_length=512, verbose=False)
    X = np.asarray(mel(y[None]))[0]
    X_lib = librosa.feature.melspectrogram(y=y, sr=sr, n_fft=n_fft,
                                           win_length=win_length,
                                           hop_length=512)
    # reference tolerance: rtol=1e-3, atol=1e-3 (tests_mel.py:32)
    assert np.allclose(X, X_lib, rtol=1e-3, atol=1e-3)
    print(f"max_abs_err mel n{n_fft}: {np.abs(X - X_lib).max():.3e}")


def test_mfcc_vs_librosa(example):
    y, sr = example
    mf = features.MFCC(sr=sr, verbose=False)
    X = np.asarray(mf(y[None]))[0]
    X_lib = librosa.feature.mfcc(y=y, sr=sr)
    # reference tolerance: rtol=1e-3, atol=1e-2 (tests_mel.py:41)
    assert np.allclose(X, X_lib, rtol=1e-3, atol=1e-2)
    print(f"max_abs_err mfcc: {np.abs(X - X_lib).max():.3e}")


@pytest.mark.parametrize("gamma", [0, 1, 2, 5, 10])
def test_vqt_vs_librosa(example, gamma):
    """The one oracle nothing else in the suite replaces: librosa.vqt for
    gamma > 0 (reference test_vqt.py:45-61)."""
    y, sr = example
    V_lib = np.abs(librosa.vqt(y=y, sr=sr, gamma=gamma))
    vq = features.VQT(sr=sr, gamma=gamma, verbose=False)
    V = np.asarray(vq(y[None], output_format="Magnitude",
                      normalization_type="librosa"))[0]
    # reference tolerance: rtol=1e-3, atol=0.8 (filter-length int vs float)
    assert np.allclose(V_lib, V, rtol=1e-3, atol=0.8)
    print(f"max_abs_err vqt gamma={gamma}: {np.abs(V_lib - V).max():.3e}")


def test_cqt1992v2_vs_librosa(example):
    y, sr = example
    C_lib = np.abs(librosa.cqt(y=y, sr=sr, hop_length=512, n_bins=84,
                               bins_per_octave=12))
    cq = features.CQT1992v2(sr=sr, hop_length=512, n_bins=84,
                            bins_per_octave=12, verbose=False)
    C = np.asarray(cq(y[None], output_format="Magnitude",
                      normalization_type="librosa"))[0]
    assert np.allclose(C_lib, C, rtol=1e-3, atol=0.8)
    print(f"max_abs_err cqt1992v2: {np.abs(C_lib - C).max():.3e}")
