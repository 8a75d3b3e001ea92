"""Vocoder-free mel-to-audio inversion (beyond-reference capability).

The reference (nnAudio) provides Griffin-Lim from a FULL magnitude
spectrogram (griffin_lim.py) but no way back from a MEL spectrogram — the
common serving case (TTS/enhancement models emit mels). librosa has
``feature.inverse.mel_to_audio`` (scipy NNLS per frame on the CPU);
torchaudio's ``InverseMelScale`` runs an SGD loop. This module is the
TPU-native design: the mel pseudo-inversion is a batched projected-gradient
NNLS whose every step is one (F × n_mels) matmul pair over all (batch, time)
columns at once — MXU-shaped, fixed step size 1/L with L = σ_max²(M)
precomputed in fp64 at init — followed by the existing fused Griffin-Lim for
phase recovery.

    inv = InverseMelSpectrogram(sr=22050, n_fft=1024, n_mels=80)
    audio = inv(mel)                       # (B, n_mels, T) -> (B, L)

Exactness contract: NNLS solves ``min_{s>=0} ||M s - mel||²`` to projected-
gradient stationarity (tested against an fp64 numpy oracle and by
mel-domain round-trip SNR); Griffin-Lim recovers phase to the usual
spectral-convergence criterion.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import dot_precision
from ..filters.mel import mel_filterbank
from .base import SpectralTransform
from .griffin_lim import Griffin_Lim


class InverseMelSpectrogram(SpectralTransform):
    """Mel spectrogram → waveform: batched NNLS mel pseudo-inversion +
    Griffin-Lim phase recovery, all on device.

    Parameters mirror :class:`~nnaudio_tpu.features.mel.MelSpectrogram`
    (the basis construction is shared) plus the two iteration counts.

    Parameters
    ----------
    sr, n_fft, n_mels, hop_length, window, fmin, fmax, htk, norm, power
        The parameters the mel spectrogram was produced with (``power`` is
        the exponent on the STFT magnitude; default 2.0).
    n_iter_nnls : int
        Projected-gradient NNLS iterations. Default 64.
    n_iter : int
        Griffin-Lim iterations. Default 32.
    center, pad_mode, momentum, iter_precision
        Forwarded to :class:`Griffin_Lim`.
    verbose : bool
        Print construction info. Default ``True``.

    Returns
    -------
    waveform : jax.Array
        ``(num_audio, samples)``.

    Examples
    --------
    >>> mel_layer = MelSpectrogram(sr=22050, n_fft=1024, n_mels=80)
    >>> inv = InverseMelSpectrogram(sr=22050, n_fft=1024, n_mels=80)
    >>> audio = inv(mel_layer(x), key=jax.random.PRNGKey(0))
    """

    _salt_fields = ("matmul_precision", "use_pallas", "use_pallas_synthesis")

    def __init__(
        self,
        sr: float = 22050,
        n_fft: int = 2048,
        n_mels: int = 128,
        hop_length: int = 512,
        window: str = "hann",
        fmin: float = 0.0,
        fmax: float | None = None,
        htk: bool = False,
        norm=1,
        power: float = 2.0,
        n_iter_nnls: int = 64,
        n_iter: int = 32,
        center: bool = True,
        pad_mode: str = "reflect",
        momentum: float = 0.99,
        iter_precision: str = "default",
        verbose: bool = True,
    ):
        super().__init__()
        if power <= 0:
            raise ValueError("power must be positive")
        self.power = power
        self.n_iter_nnls = n_iter_nnls

        basis = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk,
                               norm=norm).astype(np.float64)  # (n_mels, F)
        self._register("mel_basis", basis.astype(np.float32))
        # fp64 init-time preparations for the projected-gradient solver:
        # Lipschitz constant of ∇(1/2||Ms - mel||²) is σ_max²(M); the
        # pseudo-inverse seeds the iteration close to the solution.
        sigma_max = np.linalg.svd(basis, compute_uv=False)[0]
        self._step = float(1.0 / (sigma_max**2))
        self._register("mel_pinv", np.linalg.pinv(basis).astype(np.float32))

        self.griffin_lim = Griffin_Lim(
            n_fft=n_fft, n_iter=n_iter, hop_length=hop_length,
            win_length=None, window=window, center=center,
            pad_mode=pad_mode, momentum=momentum,
            iter_precision=iter_precision,
        )
        self._params.update(self.griffin_lim._params)
        self._verbose_print(
            verbose,
            f"InverseMel solver ready: basis {basis.shape}, "
            f"PG step {self._step:.3e}, {n_iter_nnls} NNLS + {n_iter} GL "
            "iterations",
        )

    # ------------------------------------------------------------- stages --
    def mel_to_power(self, params, mel):
        """Batched NNLS: the |STFT|^power estimate ``s >= 0`` minimizing
        ``||M s - mel||²`` per (batch, time) column. Every iteration is one
        (T-batched) matmul pair on the MXU; the fixed 1/σ_max² step makes
        plain projected gradient monotone without line searches."""
        prec = dot_precision()
        m = params["mel_basis"]
        step = self._step

        def project(basis, v):
            return jnp.einsum("gf,bgt->bft", basis, v, precision=prec,
                              preferred_element_type=jnp.float32)

        s = jnp.maximum(project(params["mel_pinv"].T, mel), 0.0)

        def body(_, s):
            resid = jnp.einsum("gf,bft->bgt", m, s, precision=prec,
                               preferred_element_type=jnp.float32) - mel
            return jnp.maximum(s - step * project(m, resid), 0.0)

        return jax.lax.fori_loop(0, self.n_iter_nnls, body, s)

    def _forward(self, params, mel, key=None):
        power_spec = self.mel_to_power(params, mel)
        magnitude = power_spec ** (1.0 / self.power)
        return self.griffin_lim._forward(params, magnitude, key=key)

    # ------------------------------------------------------------ surface --
    def __call__(self, mel, key=None):
        return self.apply(None, mel, key=key)

    def apply(self, params, mel, key=None):
        merged = dict(self._params)
        if params:
            merged.update(params)
        mel = jnp.asarray(mel)
        if mel.ndim != 3:
            raise AssertionError(
                "Please make sure your input is in the shape of "
                "(batch, n_mels, timesteps)"
            )
        from ..config import cache_salt

        cache_key = ("invmel", cache_salt(self._salt_fields))
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            fn = jax.jit(self._forward)
            self._jit_cache[cache_key] = fn
        if key is None:
            key = jax.random.PRNGKey(0)
        return fn(merged, mel, key)

    def extra_repr(self) -> str:
        return (f"mel basis = {tuple(self._params['mel_basis'].shape)}, "
                f"nnls_iters = {self.n_iter_nnls}")


class InverseMFCC(SpectralTransform):
    """MFCC → waveform: inverse DCT (the librosa ``mfcc_to_mel`` /
    ``mfcc_to_audio`` analog) feeding :class:`InverseMelSpectrogram` —
    with this, every composite in the package (STFT, Mel, MFCC, the CQT
    family) has a way back to audio.

    The DCT stage is exactly invertible only in the coefficients kept:
    with ``norm='ortho'`` the basis is orthonormal, so zero-padding the
    ``n_mfcc`` coefficients back to ``n_mels`` and applying the transpose
    is the least-squares inverse (higher mel cepstral detail is smoothed
    away, as in librosa). The dB stage inverts exactly
    (``mel = ref·10^(db/10)``); an MFCC produced with a ``top_db`` clamp
    is NOT faithfully invertible below the clamp — produce the input with
    ``MFCC(top_db=None)`` for best reconstruction (librosa's mfcc has no
    clamp, so this matches its contract).

    Parameters mirror :class:`~nnaudio_tpu.features.mel.MFCC` (analysis
    side) plus :class:`InverseMelSpectrogram`'s iteration counts.

    Examples
    --------
    >>> mf = MFCC(sr=22050, n_mfcc=20, top_db=None, n_fft=1024, n_mels=80)
    >>> inv = InverseMFCC(sr=22050, n_mfcc=20, n_fft=1024, n_mels=80)
    >>> audio = inv(mf(x), key=jax.random.PRNGKey(0))
    """

    _salt_fields = ("matmul_precision", "use_pallas", "use_pallas_synthesis")

    def __init__(
        self,
        sr: float = 22050,
        n_mfcc: int = 20,
        norm: str = "ortho",
        ref: float = 1.0,
        n_fft: int = 2048,
        n_mels: int = 128,
        hop_length: int = 512,
        window: str = "hann",
        fmin: float = 0.0,
        fmax: float | None = None,
        htk: bool = False,
        mel_norm=1,
        power: float = 2.0,
        n_iter_nnls: int = 64,
        n_iter: int = 32,
        center: bool = True,
        pad_mode: str = "reflect",
        momentum: float = 0.99,
        iter_precision: str = "default",
        verbose: bool = True,
    ):
        from ..filters.mel import dct_matrix

        super().__init__()
        if norm != "ortho":
            raise ValueError(
                "InverseMFCC requires norm='ortho': only the orthonormal "
                "DCT-II inverts by its transpose")
        self.n_mfcc = n_mfcc
        self.ref = abs(float(ref))
        self.inverse_mel = InverseMelSpectrogram(
            sr=sr, n_fft=n_fft, n_mels=n_mels, hop_length=hop_length,
            window=window, fmin=fmin, fmax=fmax, htk=htk, norm=mel_norm,
            power=power, n_iter_nnls=n_iter_nnls, n_iter=n_iter,
            center=center, pad_mode=pad_mode, momentum=momentum,
            iter_precision=iter_precision, verbose=verbose,
        )
        self._params.update(self.inverse_mel._params)
        self._register("dct_basis", dct_matrix(n_mels, n_mels, norm=norm))

    def mfcc_to_mel(self, params, mfcc):
        """Least-squares inverse of the MFCC's DCT+crop and dB stages:
        zero-pad the coefficients to ``n_mels``, apply the orthonormal
        transpose, then ``mel = ref·10^(db/10)``."""
        prec = dot_precision()
        n_mels = params["dct_basis"].shape[0]
        padded = jnp.pad(mfcc, ((0, 0), (0, n_mels - mfcc.shape[1]), (0, 0)))
        db = jnp.einsum("kf,bkt->bft", params["dct_basis"], padded,
                        precision=prec, preferred_element_type=jnp.float32)
        return jnp.asarray(self.ref, db.dtype) * 10.0 ** (db / 10.0)

    def _forward(self, params, mfcc, key=None):
        mel = self.mfcc_to_mel(params, mfcc)
        return self.inverse_mel._forward(params, mel, key=key)

    def __call__(self, mfcc, key=None):
        return self.apply(None, mfcc, key=key)

    def apply(self, params, mfcc, key=None):
        merged = dict(self._params)
        if params:
            merged.update(params)
        mfcc = jnp.asarray(mfcc)
        if mfcc.ndim != 3 or mfcc.shape[1] > merged["dct_basis"].shape[0]:
            raise AssertionError(
                "Please make sure your input is in the shape of "
                "(batch, n_mfcc, timesteps) with n_mfcc <= n_mels"
            )
        from ..config import cache_salt

        cache_key = ("invmfcc", cache_salt(self._salt_fields))
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            fn = jax.jit(self._forward)
            self._jit_cache[cache_key] = fn
        if key is None:
            key = jax.random.PRNGKey(0)
        return fn(merged, mfcc, key)

    def extra_repr(self) -> str:
        return f"n_mfcc = {self.n_mfcc}"
