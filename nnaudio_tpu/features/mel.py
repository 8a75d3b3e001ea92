"""Mel-filterbank composites: MelSpectrogram and MFCC.

TPU-native rebuild of ``/root/reference/Installation/nnAudio/features/mel.py``:
the STFT magnitude is a framed basis matmul (see ``features/stft.py``); the mel
projection is a second MXU matmul with the (trainable) filterbank
(reference ``mel.py:188``); the MFCC's DCT-II is an explicit basis matmul
instead of the reference's even/odd-shuffle FFT trick (``mel.py:281-307``) —
a dense ``(n_mels, n_mels)`` contraction is MXU-friendly and trivially
trainable, and is numerically identical to the ortho-normalized DCT-II.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.apply import project
from ..core.frame import broadcast_dim
from ..filters.mel import dct_matrix, mel_filterbank

from .base import SpectralTransform
from .stft import STFT


def power_to_db(S, amin, ref, top_db):
    """librosa-convention dB scaling (reference ``mel.py:263-303``), shared
    by :class:`MFCC` and ``streaming.StreamingMFCC`` so the two paths cannot
    drift. ``top_db`` (if given) clamps against the WHOLE-batch max — that is
    why streaming callers must pass ``top_db=None``."""
    amin = jnp.asarray(amin, dtype=S.dtype)
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin))
    log_spec = log_spec - 10.0 * jnp.log10(
        jnp.maximum(amin, jnp.asarray(ref, S.dtype)))
    if top_db is not None:
        batch_max = jnp.max(log_spec.reshape(log_spec.shape[0], -1), axis=1)
        log_spec = jnp.maximum(log_spec, batch_max[:, None, None] - top_db)
    return log_spec


def mfcc_from_db(dct_basis, db, n_mfcc):
    """Full-square DCT-II projection then crop to ``n_mfcc`` (the reference
    computes all ``n_mels`` coefficients then slices, ``mel.py:325``)."""
    return project(dct_basis, db)[:, :n_mfcc, :]


class MelSpectrogram(SpectralTransform):
    """Mel spectrogram: STFT-magnitude^power projected onto a Mel filterbank.

    Input shapes ``(len_audio,)``, ``(num_audio, len_audio)`` or
    ``(num_audio, 1, len_audio)``; arguments follow librosa (reference
    class: ``mel.py:9-194``). On TPU the whole composite —
    frame + Fourier matmul + power + filterbank projection — runs as a
    single fused Pallas kernel: the ``(B, F, T)`` spectrogram never exists
    in HBM.

    Parameters
    ----------
    sr : float
        Sampling rate of the input audio; determines the mel filter
        placement. Default 22050.
    n_fft : int
        Size of the underlying Fourier transform. Default 2048.
    win_length : int or None
        STFT window length. Default ``None`` — ``n_fft``.
    n_mels : int
        Number of mel bands. Default 128.
    hop_length : int
        Hop (stride) between frames in samples. Default 512.
    window : str
        Window function (``scipy.signal.get_window``). Default ``'hann'``.
    center : bool
        Center frames on their time index (pads ``n_fft//2`` both sides).
        Default ``True``.
    pad_mode : {'reflect', 'constant'}
        Padding used when ``center=True``. Default ``'reflect'``.
    power : float
        Exponent on the STFT magnitude before the filterbank: 1.0 for an
        energy spectrogram, 2.0 (default) for power.
    htk : bool
        Use the HTK mel formula instead of Slaney's. Default ``False``.
    fmin, fmax : float or None
        Frequency range covered by the mel filters. Defaults 0.0 /
        ``None`` (``sr/2``).
    norm : {1, None, ...}
        Mel filter normalization; ``1`` (default) is Slaney area
        normalization (divide by band width), ``None`` leaves unit peaks.
    trainable_mel : bool
        Make the mel filterbank a leaf parameter (gradients via
        ``jax.grad`` through :meth:`SpectralTransform.apply`). Default
        ``False``.
    trainable_STFT : bool
        Make the underlying Fourier kernels trainable. Default ``False``.
    verbose : bool
        Print kernel-construction info. Default ``True``.

    Returns
    -------
    spectrogram : jax.Array
        ``(num_audio, n_mels, time_steps)``.

    Examples
    --------
    >>> mel_layer = MelSpectrogram(sr=22050, n_fft=2048, n_mels=128)
    >>> mels = mel_layer(x)
    """

    _salt_fields = ('matmul_precision', 'use_pallas', 'use_pallas_analysis')

    def __init__(
        self,
        sr: float = 22050,
        n_fft: int = 2048,
        win_length: int | None = None,
        n_mels: int = 128,
        hop_length: int = 512,
        window: str = "hann",
        center: bool = True,
        pad_mode: str = "reflect",
        power: float = 2.0,
        htk: bool = False,
        fmin: float = 0.0,
        fmax: float | None = None,
        norm=1,
        trainable_mel: bool = False,
        trainable_STFT: bool = False,
        verbose: bool = True,
        **kwargs,
    ):
        super().__init__()
        self.power = power
        self.trainable_mel = trainable_mel
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
        # expose the STFT kernels in this transform's own pytree so a single
        # params dict drives the whole composite under jax.grad
        for name in ("wsin", "wcos"):
            self._register(name, self.stft._params[name], trainable=trainable_STFT)

        basis = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk, norm=norm)
        self._register("mel_basis", basis, trainable=trainable_mel)
        self._verbose_print(
            verbose, f"Mel filter created: {basis.shape} (n_mels={n_mels})"
        )

    def _forward(self, params, x):
        return self.stft._filterbank_spectrogram(
            params, broadcast_dim(x), params["mel_basis"], self.power,
            eps=1e-8 if self.trainable_STFT else 0.0,
        )

    def extra_repr(self) -> str:
        return "Mel filter banks size = {}, trainable_mel={}".format(
            tuple(self._params["mel_basis"].shape), self.trainable_mel
        )


class MFCC(SpectralTransform):
    """Mel-frequency cepstral coefficients:
    MelSpectrogram → power-to-dB → DCT-II basis matmul → top ``n_mfcc``.

    Behavior parity with the reference (``mel.py:197-329``), including the
    **batchwise** ``top_db`` max clamp of ``power_to_db`` (``mel.py:276-277``
    — the clamp reference point is the max over the whole batch, not per
    example). The DCT runs as an ortho-normalized type-II basis matmul on
    the MXU.

    Parameters
    ----------
    sr : float
        Sampling rate of the input audio. Default 22050.
    n_mfcc : int
        Number of cepstral coefficients kept. Default 20.
    norm : str
        DCT normalization; ``'ortho'`` (default) matches
        ``scipy.fft.dct(..., norm='ortho')``.
    ref : float
        Reference power for the dB conversion. Default 1.0.
    amin : float
        Floor on powers before ``log10`` (avoids ``-inf``). Default 1e-10.
    top_db : float or None
        If set (default 80.0), clamp the dB spectrogram to
        ``max - top_db``, with the max taken batchwise.
    verbose : bool
        Print kernel-construction info. Default ``True``.
    **kwargs
        Forwarded to the underlying :class:`MelSpectrogram` (``n_fft``,
        ``n_mels``, ``hop_length``, ``trainable_mel``, ...).

    Returns
    -------
    mfcc : jax.Array
        ``(num_audio, n_mfcc, time_steps)``.

    Examples
    --------
    >>> mfcc_layer = MFCC(sr=22050, n_mfcc=20)
    >>> coefs = mfcc_layer(x)
    """

    _salt_fields = ('matmul_precision', 'use_pallas', 'use_pallas_analysis')

    def __init__(
        self,
        sr: float = 22050,
        n_mfcc: int = 20,
        norm: str = "ortho",
        verbose: bool = True,
        ref: float = 1.0,
        amin: float = 1e-10,
        top_db: float | None = 80.0,
        **kwargs,
    ):
        super().__init__()
        if amin <= 0:
            raise ValueError("amin must be strictly positive")
        if top_db is not None and top_db < 0:
            raise ValueError("top_db must be non-negative")
        self.n_mfcc = n_mfcc
        self.amin = float(amin)
        self.ref = abs(float(ref))
        self.top_db = top_db

        self.melspec_layer = MelSpectrogram(sr=sr, verbose=verbose, **kwargs)
        self._params.update(self.melspec_layer._params)
        self._trainable.update(self.melspec_layer._trainable)

        n_mels = self.melspec_layer._params["mel_basis"].shape[0]
        # full square DCT basis: the reference computes all n_mels
        # coefficients then crops (mel.py:325); keep rows trainable-ready
        self._register("dct_basis", dct_matrix(n_mels, n_mels, norm=norm))

    def _power_to_db(self, S):
        return power_to_db(S, self.amin, self.ref, self.top_db)

    def _forward(self, params, x):
        mel = self.melspec_layer._forward(params, x)
        db = self._power_to_db(mel)
        return mfcc_from_db(params["dct_basis"], db, self.n_mfcc)

    def extra_repr(self) -> str:
        return f"n_mfcc = {self.n_mfcc}"
