"""The reference's test parameter grids (tests/parameters.py) against the
numpy oracle, plus fast-mode (bf16) tolerance checks."""
import numpy as np
import pytest

import nnaudio_tpu
from nnaudio_tpu import features
from tests.test_stft import np_stft_oracle

# reference stft_parameters grid (parameters.py:16-25)
STFT_PARAMS = [
    (i, j, k)
    for i in (1024, 2048)
    for k in ("ones", "hann", "hamming")
    for j in (128, 512, 1024)
    if j < i / 2
] + [(256, None, "hann")]

# reference stft_with_win_parameters grid (parameters.py:27-36)
WIN_PARAMS = [
    (i, w, k)
    for i in (512, 1024)
    for w in (400, 900)
    if w < i
    for k in (128, 256)
    if k < i / 2
]

SIG = np.random.RandomState(11).randn(8192).astype(np.float32)


@pytest.mark.parametrize("n_fft,hop,window", STFT_PARAMS)
def test_stft_parameter_grid(n_fft, hop, window):
    layer = features.STFT(n_fft=n_fft, hop_length=hop, window=window,
                          output_format="Complex", verbose=False)
    out = np.asarray(layer(SIG))
    ref = np_stft_oracle(SIG, n_fft, hop or n_fft // 4,
                         window="boxcar" if window == "ones" else window)
    scale = np.abs(ref).max()
    assert np.abs(out[0, ..., 0] - ref.real).max() / scale < 1e-5
    assert np.abs(out[0, ..., 1] - ref.imag).max() / scale < 1e-5


@pytest.mark.parametrize("n_fft,win_length,hop", WIN_PARAMS)
def test_stft_win_length_grid(n_fft, win_length, hop):
    layer = features.STFT(n_fft=n_fft, win_length=win_length, hop_length=hop,
                          output_format="Complex", verbose=False)
    out = np.asarray(layer(SIG))
    ref = np_stft_oracle(SIG, n_fft, hop, win_length=win_length)
    scale = np.abs(ref).max()
    assert np.abs(out[0, ..., 0] - ref.real).max() / scale < 1e-5
    assert np.abs(out[0, ..., 1] - ref.imag).max() / scale < 1e-5


@pytest.mark.parametrize("n_fft,win_length", [(512, 400), (1024, 1000)])
def test_mel_win_length_grid(n_fft, win_length):
    """reference mel_win_parameters (parameters.py:38)."""
    layer = features.MelSpectrogram(n_fft=n_fft, win_length=win_length,
                                    hop_length=128, n_mels=48, verbose=False)
    out = np.asarray(layer(SIG))
    assert np.isfinite(out).all() and out.min() >= 0


def test_fast_mode_tolerance():
    """bf16-multiply fast mode stays within bf16-level error of fp32."""
    layer_hi = features.STFT(n_fft=1024, hop_length=256,
                             output_format="Magnitude", verbose=False)
    want = np.asarray(layer_hi(SIG))
    with nnaudio_tpu.fast_mode():
        layer_fast = features.STFT(n_fft=1024, hop_length=256,
                                   output_format="Magnitude", verbose=False)
        got = np.asarray(layer_fast(SIG))
    rel = np.abs(got - want).max() / want.max()
    assert rel < 2e-2, rel
    # and the context restored full precision
    assert nnaudio_tpu.config.get_config().matmul_precision == "highest"
