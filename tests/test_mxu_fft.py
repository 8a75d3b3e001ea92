"""MXU-staged real FFT (ops/mxu_fft.py) vs the numpy fp64 oracle."""
import numpy as np
import pytest

from nnaudio_tpu.config import set_use_mxu_fft
from nnaudio_tpu.ops.mxu_fft import _split_factors, rfft_mxu


@pytest.fixture
def mxu_fft_off_after():
    yield
    set_use_mxu_fft(None)


def test_split_factors():
    assert _split_factors(4000) == (125, 32)   # CFP: N=8000
    assert _split_factors(8000) == (125, 64)   # fr=1
    assert _split_factors(1024) == (128, 8)    # pure power of two
    assert _split_factors(3200) == (100, 32)
    # odd part too large for one matmul stage
    assert _split_factors(3 * 641) is None


@pytest.mark.parametrize("n", [8000, 2048, 6400, 500, 4, 250, 256, 16000])
def test_rfft_matches_numpy(n):
    rng = np.random.RandomState(0)
    x = rng.randn(3, n).astype(np.float32)
    re, im = rfft_mxu(x)
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(re), want.real, atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=2e-5 * scale)


def test_rfft_unsupported_returns_none():
    assert rfft_mxu(np.zeros((2, 31), np.float32)) is None       # odd n
    assert rfft_mxu(np.zeros((2, 2 * 3 * 641), np.float32)) is None
    assert rfft_mxu(np.zeros((2, 2), np.float32)) is None        # m = 1
    # 44100: m = 22050 has only one factor of 2 -> odd part 11025 > 640
    assert rfft_mxu(np.zeros((2, 44100), np.float32)) is None


def test_rfft_pure_tone_phase():
    """A pure tone pins bin placement and phase sign (a conjugation or
    index-mapping bug would pass a random-input magnitude-heavy check)."""
    n, k = 4000, 137
    t = np.arange(n)
    x = np.cos(2 * np.pi * k * t / n + 0.3).astype(np.float32)[None]
    re, im = rfft_mxu(x)
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(np.asarray(re), want.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=2e-3)
    assert abs(np.asarray(re)[0, k] - n / 2 * np.cos(0.3)) < 1e-2


def test_rfft_batched_shapes():
    x = np.random.RandomState(1).randn(2, 5, 2048).astype(np.float32)
    re, im = rfft_mxu(x)
    assert re.shape == (2, 5, 1025) and im.shape == (2, 5, 1025)
    want = np.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(np.asarray(re), want.real, atol=1e-2)


def test_cfp_with_mxu_fft_matches_default(mxu_fft_off_after):
    """End-to-end CFP parity: forced MXU FFT vs the jnp.fft path."""
    from nnaudio_tpu import features

    x = np.random.RandomState(2).randn(1, 32000).astype(np.float32)
    m = features.Combined_Frequency_Periodicity(fs=16000, hop_length=320)
    set_use_mxu_fft(False)
    base = [np.asarray(v) for v in m(x)]
    set_use_mxu_fft(True)
    fast = [np.asarray(v) for v in m(x)]
    for a, b in zip(fast, base):
        np.testing.assert_allclose(a, b, atol=3e-4 * max(np.abs(b).max(), 1.0))
