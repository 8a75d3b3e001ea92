"""STFT / iSTFT correctness against numpy FFT oracles and round-trips.

Mirrors the reference test strategy (SURVEY.md §4): oracle equivalence for
forward outputs, round-trip property tests for the inverse. librosa is not
available in this environment, so the oracle is an explicit ``np.fft.rfft``
over hann-windowed reflect-centered frames — the exact math librosa's stft
implements.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nnaudio_tpu import features


def np_stft_oracle(x, n_fft, hop, win_length=None, center=True, window="hann"):
    """(L,) -> complex (F, T) via numpy, librosa-convention."""
    from scipy.signal import get_window

    win_length = win_length or n_fft
    w = get_window(window, win_length, fftbins=True)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    if center:
        x = np.pad(x, n_fft // 2, mode="reflect")
    T = (len(x) - n_fft) // hop + 1
    frames = np.stack([x[t * hop : t * hop + n_fft] for t in range(T)])
    return np.fft.fft(frames * w, axis=1).T[: n_fft // 2 + 1]


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (1024, 256), (2048, 512)])
def test_stft_complex_vs_fft(n_fft, hop):
    rng = np.random.RandomState(0)
    x = rng.randn(8000).astype(np.float32)
    layer = features.STFT(n_fft=n_fft, hop_length=hop, output_format="Complex",
                          verbose=False)
    out = np.asarray(layer(x))  # (1, F, T, 2)
    ref = np_stft_oracle(x, n_fft, hop)
    assert np.allclose(out[0, :, :, 0], ref.real, rtol=1e-3, atol=1e-3)
    assert np.allclose(out[0, :, :, 1], ref.imag, rtol=1e-3, atol=1e-3)


def test_stft_window_shorter_than_nfft():
    rng = np.random.RandomState(1)
    x = rng.randn(4096).astype(np.float32)
    layer = features.STFT(n_fft=1024, win_length=512, hop_length=256,
                          output_format="Complex", verbose=False)
    out = np.asarray(layer(x))
    ref = np_stft_oracle(x, 1024, 256, win_length=512)
    assert np.allclose(out[0, :, :, 0], ref.real, rtol=1e-3, atol=1e-3)
    assert np.allclose(out[0, :, :, 1], ref.imag, rtol=1e-3, atol=1e-3)


def test_stft_magnitude_and_phase():
    rng = np.random.RandomState(2)
    x = rng.randn(4096).astype(np.float32)
    layer = features.STFT(n_fft=512, hop_length=128, verbose=False)
    mag = np.asarray(layer(x, output_format="Magnitude"))[0]
    phase = np.asarray(layer(x, output_format="Phase"))[0]
    ref = np_stft_oracle(x, 512, 128)
    assert np.allclose(mag, np.abs(ref), rtol=1e-2, atol=1e-3)
    # phase compared only where there is energy (fp noise dominates silence)
    mask = np.abs(ref) > 1e-2 * np.abs(ref).max()
    err = np.abs(np.angle(ref) - phase)
    err = np.minimum(err, 2 * np.pi - err)
    assert err[mask].mean() < 2e-2


@pytest.mark.parametrize("freq_scale", ["linear", "log", "log2"])
def test_stft_freq_scales_run(freq_scale):
    x = np.random.RandomState(3).randn(2048).astype(np.float32)
    layer = features.STFT(n_fft=512, freq_bins=128, hop_length=256,
                          freq_scale=freq_scale, fmin=50, fmax=6000, sr=22050,
                          output_format="Magnitude", verbose=False)
    out = layer(x)
    assert out.shape[1] == 128
    assert np.isfinite(np.asarray(out)).all()


def test_stft_constant_pad_and_no_center():
    x = np.random.RandomState(4).randn(2048).astype(np.float32)
    out_cp = features.STFT(n_fft=512, hop_length=256, pad_mode="constant",
                           output_format="Complex", verbose=False)(x)
    ref = np_stft_oracle(np.pad(x, 256), 512, 256, center=False)
    assert np.allclose(np.asarray(out_cp)[0, ..., 0], ref.real, rtol=1e-3, atol=1e-3)
    out_nc = features.STFT(n_fft=512, hop_length=256, center=False,
                           output_format="Complex", verbose=False)(x)
    ref_nc = np_stft_oracle(x, 512, 256, center=False)
    assert np.allclose(np.asarray(out_nc)[0, ..., 0], ref_nc.real, rtol=1e-3, atol=1e-3)


def test_istft_roundtrip_random_batch():
    """Round-trip parity test (reference test_stft.py:43-54): rtol=1e-5,
    atol=1e-3 on random (4, 16000) batches."""
    rng = np.random.RandomState(5)
    x = rng.randn(4, 16000).astype(np.float32)
    layer = features.STFT(n_fft=2048, hop_length=512, iSTFT=True,
                          output_format="Complex", verbose=False)
    spec = layer(x)
    rec = np.asarray(layer.inverse(spec, length=16000))
    assert np.allclose(rec, x, rtol=1e-3, atol=1e-3)


def test_standalone_istft_roundtrip():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 8000).astype(np.float32)
    stft = features.STFT(n_fft=1024, hop_length=256, output_format="Complex",
                         verbose=False)
    istft = features.iSTFT(n_fft=1024, hop_length=256, verbose=False)
    spec = stft(x)
    rec = np.asarray(istft(spec, onesided=True, length=8000))
    assert np.allclose(rec, x, rtol=1e-3, atol=1e-3)


def test_stft_input_shapes():
    x = np.random.RandomState(7).randn(4096).astype(np.float32)
    layer = features.STFT(n_fft=512, hop_length=256, output_format="Magnitude",
                          verbose=False)
    a = np.asarray(layer(x))
    b = np.asarray(layer(x[None, :]))
    c = np.asarray(layer(x[None, None, :]))
    assert a.shape == b.shape == c.shape
    assert np.allclose(a, b) and np.allclose(a, c)


def test_trainable_stft_grad():
    x = np.random.RandomState(8).randn(1, 4096).astype(np.float32)
    layer = features.STFT(n_fft=512, hop_length=256, trainable=True,
                          output_format="Magnitude", verbose=False)
    params = layer.trainable_params()
    assert set(params) == {"wsin", "wcos"}

    def loss(p):
        return jnp.sum(layer.apply(p, x, output_format="Magnitude"))

    grads = jax.grad(loss)(params)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
        assert np.abs(np.asarray(g)).max() > 0, k


@pytest.mark.parametrize("n_fft,hop,window", [
    (512, 64, "hann"), (512, 128, "hamming"), (512, 256, "hann"),
    (1024, 128, "blackman"), (300, 75, "hann"), (1024, 320, "hann"),
])
def test_istft_roundtrip_grid(n_fft, hop, window):
    """COLA round-trip across window/hop combinations (incl. non-pow2 n_fft
    and hop not dividing n_fft)."""
    rng = np.random.RandomState(42)
    x = rng.randn(2, 6000).astype(np.float32)
    stft = features.STFT(n_fft=n_fft, hop_length=hop, window=window,
                         output_format="Complex", verbose=False)
    istft = features.iSTFT(n_fft=n_fft, hop_length=hop, window=window,
                           verbose=False)
    rec = np.asarray(istft(stft(x), onesided=True, length=6000))
    assert np.allclose(rec, x, rtol=1e-3, atol=1e-3)


def test_parseval_energy():
    """Parseval: with a rectangular window and hop=n_fft (disjoint frames),
    sum |X|^2 / n_fft == sum x^2 over the covered samples."""
    n_fft = 256
    rng = np.random.RandomState(13)
    x = rng.randn(1, 2048).astype(np.float32)
    layer = features.STFT(n_fft=n_fft, hop_length=n_fft, window="ones",
                          center=False, output_format="Complex", verbose=False)
    X = np.asarray(layer(x))[0]  # (F, T, 2), onesided
    # onesided energy: double interior bins
    w = np.full(X.shape[0], 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    spec_energy = (w[:, None] * (X ** 2).sum(-1)).sum() / n_fft
    sig_energy = (x[0, : X.shape[1] * n_fft] ** 2).sum()
    assert np.isclose(spec_energy, sig_energy, rtol=1e-4)
