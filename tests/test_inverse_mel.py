"""InverseMelSpectrogram: batched NNLS mel pseudo-inversion + Griffin-Lim.

Beyond-reference capability (librosa's mel_to_audio analog, TPU-native);
the NNLS stage is validated against scipy's fp64 reference solver and the
end-to-end path by mel-domain round-trip error.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nnaudio_tpu import features


def test_nnls_matches_scipy_objective():
    """Projected-gradient NNLS must reach (near) the scipy.optimize.nnls
    objective on random nonnegative-solution problems."""
    from scipy.optimize import nnls as scipy_nnls

    inv = features.InverseMelSpectrogram(sr=16000, n_fft=256, n_mels=24,
                                         hop_length=64, n_iter_nnls=400,
                                         verbose=False)
    M = np.asarray(inv._params["mel_basis"], np.float64)  # (24, 129)
    rng = np.random.RandomState(0)
    s_true = np.abs(rng.randn(1, M.shape[1], 6)) * (rng.rand(1, M.shape[1], 6)
                                                    > 0.5)
    mel = np.einsum("gf,bft->bgt", M, s_true).astype(np.float32)

    s_pg = np.asarray(inv.mel_to_power(dict(inv._params),
                                       jnp.asarray(mel)), np.float64)
    for t in range(mel.shape[2]):
        b = mel[0, :, t].astype(np.float64)
        s_ref, r_ref = scipy_nnls(M, b)
        r_pg = np.linalg.norm(M @ s_pg[0, :, t] - b)
        # scipy reaches the exact optimum; PG must be within a hair of it
        assert r_pg <= r_ref + 1e-3 * max(np.linalg.norm(b), 1.0), (
            t, r_pg, r_ref)


def test_mel_roundtrip_error():
    """audio -> mel -> InverseMel -> audio': the mel of the reconstruction
    must match the target mel to GL-level spectral error."""
    sr, n_fft, n_mels, hop = 16000, 512, 64, 128
    t = np.arange(sr) / sr
    x = (np.sin(2 * np.pi * 440 * t)
         + 0.5 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)[None]
    mel_layer = features.MelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                        n_mels=n_mels, verbose=False)
    mel = mel_layer(x)
    inv = features.InverseMelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                         n_mels=n_mels, n_iter_nnls=64,
                                         n_iter=24, verbose=False)
    rec = np.asarray(inv(mel, key=jax.random.PRNGKey(1)))
    assert rec.shape == x.shape
    mel2 = np.asarray(mel_layer(rec))
    m1 = np.asarray(mel)
    tt = min(m1.shape[2], mel2.shape[2])
    err = (np.linalg.norm(mel2[..., :tt] - m1[..., :tt])
           / np.linalg.norm(m1[..., :tt]))
    assert err < 0.2, err


def test_inverse_mel_power1():
    """power=1 (amplitude-mel) path: the NNLS output feeds GL without the
    square root."""
    sr, n_fft, n_mels, hop = 16000, 512, 40, 128
    x = np.random.RandomState(2).randn(1, 8192).astype(np.float32)
    mel_layer = features.MelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                        n_mels=n_mels, power=1.0,
                                        verbose=False)
    inv = features.InverseMelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                         n_mels=n_mels, power=1.0,
                                         n_iter_nnls=32, n_iter=8,
                                         verbose=False)
    rec = np.asarray(inv(mel_layer(x), key=jax.random.PRNGKey(3)))
    assert rec.shape == x.shape and np.isfinite(rec).all()


def test_inverse_mel_rejects_bad_shape():
    inv = features.InverseMelSpectrogram(sr=16000, n_fft=512, n_mels=40,
                                         hop_length=128, verbose=False)
    with pytest.raises(AssertionError, match="batch, n_mels"):
        inv(np.zeros((40, 10), np.float32))


def test_inverse_mel_real_audio():
    """Round-trip on the real-audio fixture (guitar pluck arrangement)."""
    import os

    path = os.path.join(os.path.dirname(__file__), "ground-truths",
                        "real_audio_22050.npy")
    if not os.path.exists(path):
        pytest.skip("real-audio fixture not generated")
    x = np.load(path)[None][:, : 22050]
    sr, n_fft, n_mels, hop = 22050, 1024, 80, 256
    mel_layer = features.MelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                        n_mels=n_mels, verbose=False)
    mel = mel_layer(x)
    inv = features.InverseMelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                         n_mels=n_mels, n_iter_nnls=64,
                                         n_iter=24, verbose=False)
    rec = np.asarray(inv(mel, key=jax.random.PRNGKey(4)))
    mel2 = np.asarray(mel_layer(rec))
    m1 = np.asarray(mel)
    tt = min(m1.shape[2], mel2.shape[2])
    err = (np.linalg.norm(mel2[..., :tt] - m1[..., :tt])
           / np.linalg.norm(m1[..., :tt]))
    assert err < 0.35, err


def test_nnls_stage_is_differentiable():
    """mel_to_power (a fixed-trip-count fori_loop of matmuls + relu) must be
    reverse-differentiable wrt the mel input — the seam for optimizing a
    generator against a mel target through the inversion."""
    inv = features.InverseMelSpectrogram(sr=16000, n_fft=256, n_mels=24,
                                         hop_length=64, n_iter_nnls=8,
                                         verbose=False)
    mel = jnp.asarray(np.abs(np.random.RandomState(5)
                             .randn(1, 24, 4)).astype(np.float32))
    p = dict(inv._params)

    g = jax.grad(lambda m: jnp.sum(inv.mel_to_power(p, m) ** 2))(mel)
    assert g.shape == mel.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


# ------------------------------------------------------------- InverseMFCC --
def test_mfcc_to_mel_exact_with_full_coefficients():
    """With n_mfcc == n_mels the DCT+dB stages invert exactly (orthonormal
    transpose + 10^(db/10)): the recovered mel equals the direct mel."""
    from nnaudio_tpu.features import InverseMFCC, MelSpectrogram, MFCC

    sr = 22050
    t = np.arange(sr // 2) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    kw = dict(n_fft=1024, hop_length=256, n_mels=80)
    want = np.asarray(MelSpectrogram(sr=sr, verbose=False, **kw)(x))
    M = np.asarray(MFCC(sr=sr, n_mfcc=80, top_db=None, verbose=False,
                        **kw)(x))
    inv = InverseMFCC(sr=sr, n_mfcc=80, verbose=False, **kw)
    got = np.asarray(inv.mfcc_to_mel(inv._params, M))
    np.testing.assert_allclose(got, want, atol=2e-5 * want.max())


def test_inverse_mfcc_roundtrip_consistency():
    """MFCC(top_db=None) -> InverseMFCC -> MFCC consistency: the truncated
    cepstrum + NNLS + Griffin-Lim chain lands in the same league as the GL
    spectral-convergence numbers (measured 0.10)."""
    import jax

    from nnaudio_tpu.features import InverseMFCC, MFCC

    sr = 22050
    t = np.arange(sr) / sr
    x = sum(np.sin(2 * np.pi * f * t + i)
            for i, f in enumerate([220, 440, 880, 1320])
            ).astype(np.float32)[None]
    kw = dict(n_fft=1024, hop_length=256, n_mels=80)
    mf = MFCC(sr=sr, n_mfcc=20, top_db=None, verbose=False, **kw)
    M = np.asarray(mf(x))
    inv = InverseMFCC(sr=sr, n_mfcc=20, n_iter_nnls=48, n_iter=24,
                      verbose=False, **kw)
    xr = np.asarray(inv(M, key=jax.random.PRNGKey(0)))
    M2 = np.asarray(mf(xr))
    m = min(M.shape[2], M2.shape[2])
    rel = np.linalg.norm(M2[:, :, :m] - M[:, :, :m]) / np.linalg.norm(M)
    assert rel < 0.2, rel


def test_inverse_mfcc_validates():
    from nnaudio_tpu.features import InverseMFCC

    with pytest.raises(ValueError):
        InverseMFCC(norm=None, verbose=False)
    inv = InverseMFCC(sr=22050, n_mfcc=20, n_fft=1024, n_mels=80,
                      verbose=False)
    with pytest.raises(AssertionError):
        inv(np.zeros((1, 81, 4), np.float32))  # n_mfcc > n_mels
