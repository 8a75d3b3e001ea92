"""Parity vs frozen reference outputs (tests/ground-truths/reference_oracles.npz).

Unlike test_reference_parity.py (which runs the torch reference live and
needs the mount + torch), these oracles are committed artifacts produced once
by tools/make_ground_truths.py — the suite stays reference-anchored on any
machine.
"""
import os

import numpy as np
import pytest

from nnaudio_tpu import features

PATH = os.path.join(os.path.dirname(__file__), "ground-truths",
                    "reference_oracles.npz")


@pytest.fixture(scope="module")
def oracles():
    if not os.path.exists(PATH):
        pytest.skip("frozen oracles not generated")
    with np.load(PATH) as z:
        return {k: z[k] for k in z.files}


def close(a, b, tol=2e-3):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3)
    assert err < tol, f"rel err {err:.2e}"


def test_stft_frozen(oracles):
    x = oracles["input"][None]
    out = features.STFT(n_fft=1024, hop_length=256, output_format="Complex",
                        verbose=False)(x)
    close(out, oracles["stft_complex_1024_256"])


def test_mel_frozen(oracles):
    x = oracles["input"][None]
    out = features.MelSpectrogram(sr=16000, n_fft=1024, hop_length=256,
                                  n_mels=128, verbose=False)(x)
    close(out, oracles["mel_128"])


def test_mfcc_frozen(oracles):
    x = oracles["input"][None]
    out = features.MFCC(sr=16000, n_mfcc=20, n_fft=1024, hop_length=256,
                        verbose=False)(x)
    close(out, oracles["mfcc_20"], tol=1e-4)


def test_gammatone_frozen(oracles):
    x = oracles["input"][None]
    out = features.Gammatonegram(sr=16000, n_fft=1024, hop_length=256,
                                 n_bins=64, verbose=False)(x)
    close(out, oracles["gammatone_64"])


def test_cqt1992v2_frozen(oracles):
    x = oracles["input"][None]
    out = features.CQT1992v2(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                             hop_length=256, verbose=False)(
        x, output_format="Complex")
    close(out, oracles["cqt1992v2_48"])


def test_cqt2010v2_frozen(oracles):
    x = oracles["input"][None]
    out = features.CQT2010v2(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                             hop_length=256, verbose=False)(
        x, output_format="Complex")
    close(out, oracles["cqt2010v2_48"])


def test_vqt_frozen(oracles):
    x = oracles["input"][None]
    out = features.VQT(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                       hop_length=256, gamma=2, verbose=False)(
        x, output_format="Complex")
    close(out, oracles["vqt_g2_48"])


def test_cfp_frozen(oracles):
    x = oracles["input"][None]
    out = features.CFP()(x)
    # the relu(x)^0.24 layers amplify fp32 noise near zero (d/dx -> inf);
    # the reference's own CFP test runs at log-domain atol=2.5
    close(out, oracles["cfp_Z"], tol=1e-2)


def test_cqt1992_frozen(oracles):
    if "cqt1992_40" not in oracles:
        pytest.skip("oracle not frozen")
    x = oracles["input"][None]
    out = features.CQT1992(sr=16000, fmin=220, n_bins=40, bins_per_octave=12,
                           hop_length=256)(x, output_format="Complex")
    close(out, oracles["cqt1992_40"])


def test_cqt2010_frozen(oracles):
    if "cqt2010_48" not in oracles:
        pytest.skip("oracle not frozen")
    x = oracles["input"][None]
    out = features.CQT2010(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                           hop_length=256, verbose=False)(
        x, output_format="Complex")
    close(out, oracles["cqt2010_48"])


def test_vqt_gamma5_frozen(oracles):
    if "vqt_g5_48" not in oracles:
        pytest.skip("oracle not frozen")
    x = oracles["input"][None]
    out = features.VQT(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                       hop_length=256, gamma=5, verbose=False)(
        x, output_format="Complex")
    close(out, oracles["vqt_g5_48"])


def test_stft_short_window_frozen(oracles):
    if "stft_hamming_short_win" not in oracles:
        pytest.skip("oracle not frozen")
    x = oracles["input"][None]
    out = features.STFT(n_fft=1024, win_length=400, hop_length=160,
                        window="hamming", output_format="Complex",
                        verbose=False)(x)
    close(out, oracles["stft_hamming_short_win"])


def test_stft_linear_scale_frozen(oracles):
    if "stft_linear_scale" not in oracles:
        pytest.skip("oracle not frozen")
    x = oracles["input"][None]
    out = features.STFT(n_fft=1024, freq_bins=128, hop_length=256,
                        freq_scale="linear", fmin=50, fmax=6000, sr=16000,
                        output_format="Complex", verbose=False)(x)
    close(out, oracles["stft_linear_scale"])


def test_istft_frozen(oracles):
    if "istft_roundtrip" not in oracles:
        pytest.skip("oracle not frozen")
    spec = oracles["stft_complex_1024_256"]
    out = features.iSTFT(n_fft=1024, hop_length=256, verbose=False)(
        spec, onesided=True, length=16000)
    close(out, oracles["istft_roundtrip"], tol=1e-4)
