"""ChromaSTFT: STFT-magnitude^power projected onto a 12-class chroma bank.

The reference vendors the chroma filter-bank code but never exposes a feature
class for it (``librosa_functions.py:573-716`` — noted as "plumbing-ready but
not exposed" in SURVEY.md §2); this transform completes that capability with
the same composite pattern as MelSpectrogram, following librosa's
``feature.chroma_stft`` semantics (per-frame norm applied to the projection).
"""
from __future__ import annotations

import jax.numpy as jnp


from ..core.frame import broadcast_dim
from ..filters.chroma import chroma_filterbank
from .base import SpectralTransform
from .stft import STFT


def normalize_frames(chroma, norm):
    """librosa-convention per-frame norm (``inf`` = per-frame max, a number
    = Lp norm, ``None`` = off), shared by :class:`ChromaSTFT` and
    ``streaming.StreamingChroma`` so the two paths cannot drift."""
    if norm is None:
        return chroma
    if norm == jnp.inf or norm == float("inf"):
        scale = jnp.max(jnp.abs(chroma), axis=1, keepdims=True)
    else:
        scale = jnp.sum(jnp.abs(chroma) ** norm, axis=1,
                        keepdims=True) ** (1.0 / norm)
    tiny = jnp.finfo(chroma.dtype).tiny
    return chroma / jnp.where(scale < tiny, 1.0, scale)


class ChromaSTFT(SpectralTransform):
    """Chromagram: STFT-magnitude^power folded onto pitch classes via a
    chroma filterbank. The reference ships the chroma filter math in
    ``librosa_functions.py:573-716`` but never exposes a feature class —
    this class completes that plumbing (beyond-reference surface).

    Parameters
    ----------
    sr : float
        Sampling rate; determines pitch-class mapping. Default 22050.
    n_fft : int
        Fourier transform size. Default 2048.
    win_length : int or None
        STFT window length. Default ``None`` — ``n_fft``.
    n_chroma : int
        Number of pitch classes. Default 12.
    hop_length : int
        Hop between frames. Default 512.
    window : str
        STFT window. Default ``'hann'``.
    center : bool
        Center frames on their time index. Default ``True``.
    pad_mode : {'reflect', 'constant'}
        Padding when centered. Default ``'reflect'``.
    power : float
        Exponent on the STFT magnitude. Default 2.0.
    tuning : float
        Tuning offset in fractions of a chroma bin. Default 0.0.
    norm : float or None
        Per-frame column normalization of the chroma filters (librosa
        convention; ``inf`` = max-norm). Default ``inf``.
    trainable_chroma : bool
        Make the chroma filterbank a leaf parameter. Default ``False``.
    trainable_STFT : bool
        Make the Fourier kernels trainable. Default ``False``.
    verbose : bool
        Print kernel-construction info. Default ``True``.

    Returns
    -------
    chromagram : jax.Array
        ``(num_audio, n_chroma, time_steps)``.

    Examples
    --------
    >>> chroma_layer = ChromaSTFT(sr=22050, n_chroma=12)
    >>> chroma = chroma_layer(x)
    """

    _salt_fields = ('matmul_precision', 'use_pallas', 'use_pallas_analysis')

    def __init__(
        self,
        sr: float = 22050,
        n_fft: int = 2048,
        win_length: int | None = None,
        n_chroma: int = 12,
        hop_length: int = 512,
        window: str = "hann",
        center: bool = True,
        pad_mode: str = "reflect",
        power: float = 2.0,
        tuning: float = 0.0,
        norm=jnp.inf,
        trainable_chroma: bool = False,
        trainable_STFT: bool = False,
        verbose: bool = True,
        **kwargs,
    ):
        super().__init__()
        self.power = power
        self.norm = norm
        self.trainable_chroma = trainable_chroma
        self.trainable_STFT = trainable_STFT

        self.stft = STFT(
            n_fft=n_fft,
            win_length=win_length,
            freq_bins=None,
            hop_length=hop_length,
            window=window,
            freq_scale="no",
            center=center,
            pad_mode=pad_mode,
            sr=sr,
            trainable=trainable_STFT,
            output_format="Magnitude",
            verbose=verbose,
            **kwargs,
        )
        for name in ("wsin", "wcos"):
            self._register(name, self.stft._params[name], trainable=trainable_STFT)

        basis = chroma_filterbank(sr, n_fft, n_chroma=n_chroma, tuning=tuning)
        self._register("chroma_basis", basis, trainable=trainable_chroma)
        self._verbose_print(
            verbose, f"Chroma filter created: {basis.shape} (n_chroma={n_chroma})"
        )

    def _forward(self, params, x):
        # same fused composite as Mel/Gammatone (frame+DFT+power+projection
        # in one kernel at power=2); the per-frame norm below stays XLA
        chroma = self.stft._filterbank_spectrogram(
            params, broadcast_dim(x), params["chroma_basis"], self.power,
            eps=1e-8 if self.trainable_STFT else 0.0,
        )
        return normalize_frames(chroma, self.norm)
