"""Parity on REAL recorded audio (committed fixture + frozen reference
oracles; tools/make_audio_fixture.py).

The reference tests on actual music (librosa.example('vibeace'),
/root/reference/Installation/tests/test_stft.py:23) because pure synthetics
(chirps/noise) can mask perceptually-banded errors; this zero-egress image
can't download audio, so the fixture is a 2 s overlap-add arrangement of
CPython's real guitar-pluck recording — true harmonic decay structure and
transients. Oracles are the torch reference's outputs on the exact clip.
"""
import os

import numpy as np
import pytest

from nnaudio_tpu import features, streaming

GT = os.path.join(os.path.dirname(__file__), "ground-truths")


@pytest.fixture(scope="module")
def oracles():
    path = os.path.join(GT, "real_audio_oracles.npz")
    if not os.path.exists(path):
        pytest.skip("real-audio oracles not generated")
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def close(a, b, tol=2e-3):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, (a.shape, b.shape)
    err = np.abs(a - b).max() / max(np.abs(b).max(), 1e-3)
    assert err < tol, f"rel err {err:.2e}"


def test_fixture_is_committed_and_real():
    clip = np.load(os.path.join(GT, "real_audio_22050.npy"))
    assert clip.dtype == np.float32 and clip.ndim == 1
    assert clip.shape[0] == 44100  # 2.0 s @ 22050
    # sanity: decaying-harmonic structure, not noise/chirp — low spectral
    # flatness (tonal; white noise measures ~0.57, this clip ~5e-4) and
    # energy concentrated in few bands (noise top-20 share is ~0.013)
    spec = np.abs(np.fft.rfft(clip[:8192] * np.hanning(8192)))
    flatness = np.exp(np.mean(np.log(spec**2 + 1e-20))) / np.mean(spec**2)
    assert flatness < 0.01, flatness
    top = np.sort(spec)[-20:].sum() / spec.sum()
    assert top > 0.1, top


def test_stft_real_audio(oracles):
    x = oracles["input"][None]
    out = features.STFT(n_fft=1024, hop_length=256, output_format="Complex",
                        verbose=False)(x)
    close(out, oracles["stft_complex_1024_256"])


def test_mel_real_audio(oracles):
    x = oracles["input"][None]
    out = features.MelSpectrogram(sr=22050, n_fft=1024, hop_length=256,
                                  n_mels=128, verbose=False)(x)
    close(out, oracles["mel_128"])


def test_mfcc_real_audio(oracles):
    x = oracles["input"][None]
    out = features.MFCC(sr=22050, n_mfcc=20, n_fft=1024, hop_length=256,
                        verbose=False)(x)
    # dB-scale output: absolute tolerance on the log scale
    got, want = np.asarray(out), oracles["mfcc_20"]
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 0.05


def test_gammatone_real_audio(oracles):
    x = oracles["input"][None]
    out = features.Gammatonegram(sr=22050, n_fft=1024, hop_length=256,
                                 n_bins=64, verbose=False)(x)
    close(out, oracles["gammatone_64"])


def test_cqt1992v2_real_audio(oracles):
    x = oracles["input"][None]
    out = features.CQT1992v2(sr=22050, fmin=32.70, n_bins=84,
                             bins_per_octave=12, hop_length=512,
                             verbose=False)(x, output_format="Magnitude")
    close(out, oracles["cqt1992v2_84"])


def test_cqt2010v2_real_audio(oracles):
    x = oracles["input"][None]
    out = features.CQT2010v2(sr=22050, fmin=32.70, n_bins=84,
                             bins_per_octave=12, hop_length=512,
                             verbose=False)(x, output_format="Magnitude")
    close(out, oracles["cqt2010v2_84"])


def test_cqt2010v2_real_audio_parallel_chain(oracles):
    """The parallel composed-cascade chain must hold reference parity on
    real audio too, not just serial-vs-parallel self-consistency."""
    from nnaudio_tpu import set_use_parallel_chain

    x = oracles["input"][None]
    layer = features.CQT2010v2(sr=22050, fmin=32.70, n_bins=84,
                               bins_per_octave=12, hop_length=512,
                               verbose=False)
    try:
        set_use_parallel_chain(True)
        out = layer(x, output_format="Magnitude")
    finally:
        set_use_parallel_chain(None)
    close(out, oracles["cqt2010v2_84"])


def test_vqt_real_audio(oracles):
    x = oracles["input"][None]
    out = features.VQT(sr=22050, fmin=32.70, n_bins=84, bins_per_octave=12,
                       hop_length=512, gamma=2, verbose=False)(x)
    close(out, oracles["vqt_84_g2"])


def test_streaming_mel_real_audio(oracles):
    """Streaming on the real clip equals the offline center=False transform
    (chunk seams land mid-pluck-decay, a realistic serving pattern)."""
    x = oracles["input"][None]
    hop = 256
    total = (x.shape[1] // hop) * hop
    x = x[:, :total]
    s = streaming.StreamingMel(sr=22050, n_fft=1024, hop_length=hop,
                               n_mels=128)
    state = s.init_state(1)
    outs = []
    for pos in range(0, total, hop * 12):
        state, mel = s.step(state, x[:, pos : pos + hop * 12])
        if mel.shape[2]:
            outs.append(np.asarray(mel))
    got = np.concatenate(outs, axis=2)
    offline = features.MelSpectrogram(sr=22050, n_fft=1024, hop_length=hop,
                                      n_mels=128, center=False,
                                      verbose=False)
    want = np.asarray(offline(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())
