"""Mel / MFCC / Gammatone / Chroma correctness.

The mel filterbank is checked against an independently-written loop-based
Slaney implementation (double-entry bookkeeping for the vectorized builder);
the DCT is checked against ``scipy.fft.dct``; composite transforms are checked
against a full numpy oracle pipeline.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.fft

from nnaudio_tpu import features
from nnaudio_tpu.filters.mel import mel_filterbank, dct_matrix, hz_to_mel, mel_to_hz
from tests.test_stft import np_stft_oracle


def slaney_mel_oracle(sr, n_fft, n_mels, fmin, fmax):
    """Loop-based Slaney mel bank, written independently of filters/mel.py."""
    def to_mel(f):
        if f < 1000.0:
            return f / (200.0 / 3)
        return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def to_hz(m):
        if m < 15.0:
            return m * (200.0 / 3)
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    pts = [to_hz(m) for m in np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)]
    fft_f = np.arange(n_fft // 2 + 1) * sr / n_fft
    out = np.zeros((n_mels, len(fft_f)))
    for i in range(n_mels):
        lo, mid, hi = pts[i], pts[i + 1], pts[i + 2]
        for j, f in enumerate(fft_f):
            if lo <= f <= mid and mid != lo:
                out[i, j] = (f - lo) / (mid - lo)
            elif mid < f <= hi and hi != mid:
                out[i, j] = (hi - f) / (hi - mid)
        out[i] *= 2.0 / (hi - lo)
    return out


def test_mel_scale_inverses():
    f = np.linspace(0, 11025, 257)
    assert np.allclose(mel_to_hz(hz_to_mel(f)), f, atol=1e-6)
    assert np.allclose(mel_to_hz(hz_to_mel(f, htk=True), htk=True), f, atol=1e-6)


def test_mel_filterbank_vs_oracle():
    got = mel_filterbank(22050, 2048, n_mels=64, fmin=0.0, fmax=11025.0)
    want = slaney_mel_oracle(22050, 2048, 64, 0.0, 11025.0)
    assert np.allclose(got, want, atol=1e-6)


def test_dct_matrix_vs_scipy():
    n = 128
    basis = dct_matrix(n, n, norm="ortho")
    x = np.random.RandomState(0).randn(n).astype(np.float64)
    want = scipy.fft.dct(x, type=2, norm="ortho")
    got = basis.astype(np.float64) @ x
    assert np.allclose(got, want, atol=1e-5)


def test_melspectrogram_vs_numpy_oracle():
    sr, n_fft, hop, n_mels = 22050, 1024, 256, 64
    x = np.random.RandomState(1).randn(sr).astype(np.float32)
    layer = features.MelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                    n_mels=n_mels, verbose=False)
    got = np.asarray(layer(x))[0]
    spec = np.abs(np_stft_oracle(x, n_fft, hop)) ** 2
    want = slaney_mel_oracle(sr, n_fft, n_mels, 0.0, sr / 2) @ spec
    assert np.allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mfcc_vs_numpy_oracle():
    sr, n_fft, hop = 22050, 1024, 256
    x = np.random.RandomState(2).randn(sr).astype(np.float32)
    layer = features.MFCC(sr=sr, n_mfcc=20, n_fft=n_fft, hop_length=hop,
                          n_mels=64, verbose=False)
    got = np.asarray(layer(x))[0]

    spec = np.abs(np_stft_oracle(x, n_fft, hop)) ** 2
    mel = slaney_mel_oracle(sr, n_fft, 64, 0.0, sr / 2) @ spec
    db = 10.0 * np.log10(np.maximum(mel, 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    want = scipy.fft.dct(db, axis=0, type=2, norm="ortho")[:20]
    assert np.allclose(got, want, rtol=1e-3, atol=1e-2)


def test_gammatonegram_runs_and_matches_projection():
    sr = 22050
    x = np.random.RandomState(3).randn(sr).astype(np.float32)
    layer = features.Gammatonegram(sr=sr, n_fft=1024, hop_length=256,
                                   n_bins=64, verbose=False)
    got = np.asarray(layer(x))[0]
    spec = np.abs(np_stft_oracle(x, 1024, 256)) ** 2
    bank = np.asarray(layer.params["gammatone_basis"])
    want = bank @ spec
    assert got.shape == (64, spec.shape[1])
    assert np.allclose(got, want, rtol=1e-3, atol=1e-3)
    assert (bank >= 0).all() and bank.max() > 0


def test_chroma_stft_shape_and_norm():
    x = np.random.RandomState(4).randn(22050).astype(np.float32)
    layer = features.ChromaSTFT(sr=22050, n_fft=1024, hop_length=256,
                                verbose=False)
    out = np.asarray(layer(x))[0]
    assert out.shape[0] == 12
    assert np.isfinite(out).all()
    # inf-norm per frame: max over chroma bins is 1 wherever there is energy
    assert np.allclose(out.max(axis=0), 1.0, atol=1e-5)


def test_trainable_mel_grads():
    x = np.random.RandomState(5).randn(1, 8192).astype(np.float32)
    layer = features.MelSpectrogram(n_fft=1024, hop_length=512, n_mels=32,
                                    trainable_mel=True, trainable_STFT=True,
                                    verbose=False)
    params = layer.trainable_params()
    assert set(params) == {"mel_basis", "wsin", "wcos"}

    def loss(p):
        return jnp.sum(layer.apply(p, x))

    grads = jax.grad(loss)(params)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
