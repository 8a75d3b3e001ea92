"""ChromaSTFT: STFT-magnitude^power projected onto a 12-class chroma bank.

The reference vendors the chroma filter-bank code but never exposes a feature
class for it (``librosa_functions.py:573-716`` — noted as "plumbing-ready but
not exposed" in SURVEY.md §2); this transform completes that capability with
the same composite pattern as MelSpectrogram, following librosa's
``feature.chroma_stft`` semantics (per-frame norm applied to the projection).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.apply import project
from ..core.frame import broadcast_dim
from ..filters.chroma import chroma_filterbank
from .base import SpectralTransform
from .stft import STFT


class ChromaSTFT(SpectralTransform):
    """Output shape ``(B, n_chroma, T)``."""

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
        x = broadcast_dim(x)
        spec = self.stft._power_spectrogram(params, x, self.power)
        chroma = project(params["chroma_basis"], spec)
        if self.norm is not None:
            # librosa chroma_stft default: per-frame inf-norm
            if self.norm == jnp.inf or self.norm == float("inf"):
                scale = jnp.max(jnp.abs(chroma), axis=1, keepdims=True)
            else:
                scale = jnp.sum(jnp.abs(chroma) ** self.norm, axis=1, keepdims=True) ** (
                    1.0 / self.norm
                )
            tiny = jnp.finfo(chroma.dtype).tiny
            chroma = chroma / jnp.where(scale < tiny, 1.0, scale)
        return chroma
