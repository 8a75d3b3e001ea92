"""Gammatonegram: STFT-magnitude^power projected onto an ERB gammatone bank.

TPU-native rebuild of ``/root/reference/Installation/nnAudio/features/gammatone.py``:
identical composite shape to MelSpectrogram but with the 4th-order gammatone
filterbank (``get_gammatone``, librosa_functions.py:153-198). Defaults preserve
the reference's actual (not docstring) value ``n_bins=64`` (gammatone.py:98).
"""
from __future__ import annotations


from ..core.frame import broadcast_dim
from ..filters.gammatone import gammatone_filterbank

from .base import SpectralTransform
from .stft import STFT


class Gammatonegram(SpectralTransform):
    """Gammatonegram: STFT-magnitude^power projected onto a 4th-order
    gammatone (ERB-scale) filterbank — the auditory-model analogue of the
    mel spectrogram (reference ``gammatone.py``). On TPU the composite runs
    as the fused frame+matmul+power+filterbank Pallas kernel.

    Parameters
    ----------
    sr : float
        Sampling rate; determines ERB filter placement. Default 22050.
    n_fft : int
        Fourier transform size. Default 2048.
    win_length : int or None
        STFT window length. Default ``None`` — ``n_fft``.
    n_bins : int
        Number of gammatone channels. Default 64 (the reference hardcodes
        64 in its filterbank call regardless of this argument — quirk
        replicated; see filters/gammatone.py).
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
    htk, fmin, fmax, norm
        Accepted for signature parity with MelSpectrogram; the gammatone
        bank uses the ERB scale (fmin/fmax shape it).
    trainable_bins : bool
        Make the gammatone filterbank a leaf parameter. Default ``False``.
    trainable_STFT : bool
        Make the Fourier kernels trainable. Default ``False``.
    verbose : bool
        Print kernel-construction info. Default ``True``.

    Returns
    -------
    spectrogram : jax.Array
        ``(num_audio, n_bins, time_steps)``.

    Examples
    --------
    >>> gamma_layer = Gammatonegram(sr=44100, n_bins=64)
    >>> spec = gamma_layer(x)
    """

    _salt_fields = ('matmul_precision', 'use_pallas', 'use_pallas_analysis')

    def __init__(
        self,
        sr: float = 22050,
        n_fft: int = 2048,
        win_length: int | None = None,
        n_bins: int = 64,
        hop_length: int = 512,
        window: str = "hann",
        center: bool = True,
        pad_mode: str = "reflect",
        power: float = 2.0,
        htk: bool = False,
        fmin: float = 0.0,
        fmax: float | None = None,
        norm=1,
        trainable_bins: bool = False,
        trainable_STFT: bool = False,
        verbose: bool = True,
        **kwargs,
    ):
        super().__init__()
        self.power = power
        self.trainable_bins = trainable_bins
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

        basis = gammatone_filterbank(sr, n_fft, n_bins, fmin=fmin, fmax=fmax)
        self._register("gammatone_basis", basis, trainable=trainable_bins)
        self._verbose_print(
            verbose, f"Gammatone filter created: {basis.shape} (n_bins={n_bins})"
        )

    def _forward(self, params, x):
        return self.stft._filterbank_spectrogram(
            params, broadcast_dim(x), params["gammatone_basis"], self.power,
            eps=1e-8 if self.trainable_STFT else 0.0,
        )

    def extra_repr(self) -> str:
        return "Gammatone filter banks size = {}, trainable_bins={}".format(
            tuple(self._params["gammatone_basis"].shape), self.trainable_bins
        )
