"""Reference-name compatibility layer for the function-level API.

The reference star-exports its kernel generators and vendored librosa helpers
through ``nnAudio.features`` (features/__init__.py:6-14), so downstream code
imports names like ``create_fourier_kernels`` or ``get_mel`` directly. This
module maps those exact names and signatures onto our builders so such code
ports with an import swap. Returns are NumPy arrays (host-side, as in the
reference); device-side helpers live in :mod:`nnaudio_tpu.core`.
"""
from __future__ import annotations

import numpy as np

from .filters.cqt import (
    create_cqt_kernels as _create_cqt_kernels,
    create_lowpass_filter as _create_lowpass_filter,
    early_downsample_params,
    next_pow2_exponent,
)
from .filters.fourier import create_fourier_basis
from .filters.gammatone import gammatone_filterbank
from .filters.mel import (
    fft_frequencies,
    hz_to_mel,
    mel_filterbank,
    mel_frequencies,
    mel_to_hz,
)
from .filters.chroma import chroma_filterbank, hz_to_octs
from .filters.windows import pad_center, window_dispatch

__all__ = [
    "create_fourier_kernels",
    "create_cqt_kernels",
    "create_lowpass_filter",
    "get_window_dispatch",
    "get_mel",
    "get_gammatone",
    "chroma",
    "nextpow2",
    "hz_to_mel",
    "mel_to_hz",
    "mel_frequencies",
    "fft_frequencies",
    "hz_to_octs",
    "pad_center",
    "get_early_downsample_params",
]


def create_fourier_kernels(
    n_fft,
    win_length=None,
    freq_bins=None,
    fmin=50,
    fmax=6000,
    sr=44100,
    freq_scale="linear",
    window="hann",
    verbose=True,
):
    """Reference signature (utils.py:241): returns
    ``(wsin, wcos, bins2freq, binslist, window_mask)`` as float32 arrays,
    kernels shaped ``(freq_bins, 1, n_fft)`` like the conv1d layout."""
    basis = create_fourier_basis(
        n_fft, win_length=win_length, freq_bins=freq_bins, fmin=fmin,
        fmax=fmax, sr=sr, freq_scale=freq_scale, window=window,
    )
    return (
        basis.wsin[:, None, :],
        basis.wcos[:, None, :],
        basis.bins2freq,
        basis.binslist,
        basis.window_mask,
    )


def create_cqt_kernels(
    Q, fs, fmin, n_bins=84, bins_per_octave=12, norm=1, window="hann",
    fmax=None, topbin_check=True, gamma=0, pad_fft=True,
):
    """Reference signature (utils.py:399): returns
    ``(kernels, fftLen, lengths, freqs)``."""
    bank = _create_cqt_kernels(
        Q, fs, fmin, n_bins, bins_per_octave, norm, window, fmax,
        topbin_check=topbin_check, gamma=gamma,
    )
    return bank.kernels, bank.fft_len, bank.lengths, bank.freqs


def create_lowpass_filter(band_center=0.5, kernelLength=256,
                          transitionBandwidth=0.03):
    """Reference signature (utils.py:562) including its camelCase kwargs."""
    return _create_lowpass_filter(band_center, kernelLength, transitionBandwidth)


def get_window_dispatch(window, N, fftbins=True):
    return window_dispatch(window, N, fftbins=fftbins)


def get_mel(sr, n_fft, n_mels=128, fmin=0.0, fmax=None, htk=False, norm=1,
            dtype=np.float32):
    """librosa_functions.py:375."""
    return mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk, norm=norm,
                          dtype=dtype)


def get_gammatone(sr, n_fft, n_bins=64, fmin=20.0, fmax=None, htk=False,
                  norm=1, dtype=np.float32):
    """librosa_functions.py:153."""
    return gammatone_filterbank(sr, n_fft, n_bins, fmin=fmin, fmax=fmax,
                                dtype=dtype)


def chroma(sr, n_fft, n_chroma=12, A440=440.0, ctroct=5.0, octwidth=2,
           norm=2, base_c=True, dtype=np.float32):
    """librosa_functions.py:573 (tuning derived from A440)."""
    tuning = 12 * np.log2(A440 / 440.0)
    return chroma_filterbank(
        sr, n_fft, n_chroma=n_chroma, tuning=tuning, ctroct=ctroct,
        octwidth=octwidth, norm=norm, base_c=base_c, dtype=dtype,
    )


def nextpow2(A):
    """Reference quirk preserved: floor(log2(A)) despite the name
    (utils.py:172)."""
    return next_pow2_exponent(A)


def get_early_downsample_params(sr, hop_length, fmax_t, Q, n_octaves,
                                verbose=False):
    """utils.py:599; returns (sr, hop_length, factor, filter, active)."""
    new_sr, new_hop, factor, filt, active = early_downsample_params(
        sr, hop_length, fmax_t, Q, n_octaves
    )
    return new_sr, new_hop, factor, filt, active
