"""Host-side basis builders: golden checks against scipy/explicit formulas."""
import numpy as np
import pytest
from scipy.signal import get_window

from nnaudio_tpu.filters.fourier import create_fourier_basis, fourier_bin_positions
from nnaudio_tpu.filters.cqt import (
    create_cqt_kernels,
    create_lowpass_filter,
    early_downsample_params,
    next_pow2_exponent,
)
from nnaudio_tpu.filters.windows import pad_center, window_dispatch


def test_fourier_basis_is_dft():
    basis = create_fourier_basis(64, window="ones")
    n = np.arange(64)
    for k in [0, 1, 7, 32]:
        assert np.allclose(basis.wcos[k], np.cos(2 * np.pi * k * n / 64), atol=1e-6)
        assert np.allclose(basis.wsin[k], np.sin(2 * np.pi * k * n / 64), atol=1e-6)


def test_fourier_bin_positions_scales():
    lin = fourier_bin_positions(1024, 128, 50, 6000, 22050, "linear")
    assert np.isclose(lin[0], 50 * 1024 / 22050)
    log = fourier_bin_positions(1024, 128, 50, 6000, 22050, "log")
    assert np.isclose(log[0], 50 * 1024 / 22050)
    ratios = log[1:] / log[:-1]
    assert np.allclose(ratios, ratios[0])  # geometric spacing
    no = fourier_bin_positions(1024, 513, 50, 6000, 22050, "no")
    assert np.array_equal(no, np.arange(513))


def test_window_dispatch_variants():
    assert np.allclose(window_dispatch("hann", 64), get_window("hann", 64))
    g = window_dispatch(("gaussian", 60.0), 64)
    assert g.shape == (64,) and g.max() <= 1.0
    k = window_dispatch(8.6, 64)
    assert np.allclose(k, get_window(8.6, 64))
    with pytest.raises(TypeError):
        window_dispatch([1, 2], 64)


def test_pad_center():
    w = np.ones(10)
    p = pad_center(w, 16)
    assert p.shape == (16,)
    assert p[3] == 1 and p[2] == 0 and p[13] == 0 and p[12] == 1
    with pytest.raises(ValueError):
        pad_center(w, 5)


def test_cqt_kernels_properties():
    Q = 1.0 / (2 ** (1 / 12) - 1)
    bank = create_cqt_kernels(Q, 22050, 32.70, 84, 12, 1, "hann", None)
    assert bank.kernels.shape[0] == 84
    assert bank.fft_len == 2 ** int(np.ceil(np.log2(bank.lengths.max())))
    # L1 norm = 1 per kernel (norm=1)
    l1 = np.abs(bank.kernels).sum(axis=1)
    assert np.allclose(l1, 1.0, atol=1e-4)
    # center frequency: peak of |FFT| at freq * fft_len / fs
    k = 83
    spec = np.abs(np.fft.fft(bank.kernels[k]))
    peak = spec[: bank.fft_len // 2].argmax()
    expected = bank.freqs[k] * bank.fft_len / 22050
    assert abs(peak - expected) <= 1.0


def test_cqt_nyquist_check():
    Q = 1.0 / (2 ** (1 / 12) - 1)
    with pytest.raises(ValueError):
        create_cqt_kernels(Q, 22050, 220, 84, 12, 1, "hann", None)


def test_lowpass_filter_response():
    fir = create_lowpass_filter(0.5, 256, 0.001)
    w = np.fft.rfft(fir, 4096)
    freqs = np.linspace(0, 1, len(w))  # in units of Nyquist
    assert np.abs(w)[freqs < 0.4].min() > 0.9
    assert np.abs(w)[freqs > 0.6].max() < 0.1


def test_next_pow2_is_ceil():
    # parity with reference nextpow2 = ceil(log2) (utils.py:128-148);
    # the floor twin is prepow2 (utils.py:152-172)
    assert next_pow2_exponent(6) == 3
    assert next_pow2_exponent(512) == 9
    assert next_pow2_exponent(513) == 10


def test_early_downsample_params():
    Q = 1.0 / (2 ** (1 / 12) - 1)
    # default CQT2010v2 config: no early downsampling possible
    sr, hop, factor, filt, active = early_downsample_params(
        22050, 512, 3951.0, Q, 7
    )
    assert factor == 1 and not active
    # low fmax_t with generous hop: downsampling kicks in
    sr, hop, factor, filt, active = early_downsample_params(
        22050, 512, 500.0, Q, 3
    )
    assert active and factor > 1 and hop == 512 // factor
    assert filt is not None


def test_compat_reference_names():
    """Reference function names resolve through the features namespace with
    reference-shaped returns."""
    from nnaudio_tpu import features as F

    wsin, wcos, b2f, blist, wmask = F.create_fourier_kernels(256, freq_scale="no")
    assert wsin.shape == (129, 1, 256) and wmask.shape == (256,)

    kern, fft_len, lengths, freqs = F.create_cqt_kernels(16.8, 22050, 55, 24, 12)
    assert kern.shape[0] == 24 and kern.shape[1] == fft_len

    mel = F.get_mel(22050, 1024, 64)
    assert mel.shape == (64, 513)
    gt = F.get_gammatone(22050, 1024, 64)
    assert gt.shape == (64, 513)
    ch = F.chroma(22050, 1024)
    assert ch.shape == (12, 513)
    assert F.nextpow2(513) == 10
    fir = F.create_lowpass_filter(0.5, kernelLength=256, transitionBandwidth=0.001)
    assert fir.shape == (256,)


def test_spectrogram_compat_namespace():
    """Deprecated reference import path works and warns (Spectrogram.py:1-8)."""
    import importlib
    import sys
    import warnings as w

    sys.modules.pop("nnaudio_tpu.Spectrogram", None)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        mod = importlib.import_module("nnaudio_tpu.Spectrogram")
    assert any(issubclass(c.category, DeprecationWarning) for c in caught)
    assert hasattr(mod, "STFT") and hasattr(mod, "CQT2010v2")
