"""Constant-Q transform family: CQT1992, CQT1992v2 (= CQT), CQT2010, CQT2010v2.

TPU-native rebuild of ``/root/reference/Installation/nnAudio/features/cqt.py``.
Every variant is one or more framed basis matmuls on the MXU instead of strided
conv1d; the 2010 pyramid's octave loop is unrolled at trace time (static
``n_octaves``), with FIR downsampling between octaves.

API-visible conventions preserved (SURVEY.md §7 "quirks"):
- 1992-family centers pad ``kernel_width//2`` only when ``center=True``
  (cqt.py:205-211, 741-746); the 2010 pyramid always pads ``n_fft//2``
  (cqt.py:474-478, 1063-1068).
- Sign conventions differ per variant and are replicated exactly:
  CQT1992 stacks ``(real, -imag)`` post complex-mul but computes Phase from
  the *un-negated* pre-normalization pair (cqt.py:222-251); CQT1992v2 and
  CQT2010v2 negate at the conv (cqt.py:749-750, utils.py:518-519); CQT2010
  stacks the complex-mul result without negation (utils.py:548-559).
- ``normalization_type`` ∈ {librosa, convolutional, wrap} on every variant.
- Magnitude adds 1e-8 under the sqrt only when trainable
  (cqt.py:771, 1130-1134).
"""
from __future__ import annotations

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from ..core.apply import complex_bank_mul, phase_unit_stack
from ..core.frame import broadcast_dim, pad_signal
from ..config import parallel_chain_enabled
from ..core.resample import compose_cascade, compose_cascade_jnp, downsample_by_n
from ..filters.cqt import create_cqt_kernels, create_lowpass_filter, early_downsample_params
from ..filters.fourier import create_fourier_basis
from ..ops.dispatch import framed_basis_pair, framed_complex, framed_magnitude
from ..ops.pyramid import pyramid_basis_pair, pyramid_enabled
from .base import SpectralTransform


def _center_pad(x, pad_amount: int, pad_mode: str):
    """Reflect padding with the reference's constant-pad fallback for signals
    shorter than the pad (utils.py:505-517)."""
    if pad_mode == "reflect" and x.shape[-1] < pad_amount + 1:
        warnings.warn(
            f"input size = {x.shape}\tkernel pad = {pad_amount}\n"
            "padding with reflection mode might not be the best choice, "
            "try using constant padding",
            UserWarning,
        )
        pad_mode = "constant"
    return pad_signal(x, pad_amount, pad_mode)


def _cqt_output(real, imag, output_format: str, trainable: bool):
    """Shared Magnitude/Complex/Phase heads (cqt.py:766-780)."""
    if output_format == "Magnitude":
        power = real * real + imag * imag
        if trainable:
            return jnp.sqrt(power + 1e-8)
        return jnp.sqrt(power)
    if output_format == "Complex":
        return jnp.stack((real, imag), axis=-1)
    if output_format == "Phase":
        return phase_unit_stack(real, imag)
    raise ValueError(f"unknown output_format {output_format!r}")


def _dual_synthesis_bank(atoms: np.ndarray, hop: int, band_eta: float):
    """Canonical-dual synthesis kernels (fp64) for a frame of complex
    analysis atoms (rows of ``atoms``; ``X = x·A`` at stride ``hop``).

    The frame operator of a band-limited multi-bin frame is diagonal in
    FREQUENCY — a time-domain window-sumsquare normalization (the iSTFT
    recipe) is wrong here — so the duals divide by ``G(ω) = Σ_f |B_f(ω)|²``
    on the covered band: ``D̂_f = hop·conj(B_f)·[G > η·Gmax]/max(G, η·Gmax)``
    with ``B_f(ω) = Σ_s A_f[s]e^{+iωs}``. The η-floor is essential: where
    both ``B_f`` and ``G`` are tiny (band edges, mirror frequencies) the
    unregularized ratio is amplified 0/0 noise (measured: −30 dB
    reconstruction without it, +53 dB with η=1e-3).

    Returns fp32 ``(kc, ks)`` such that ``x̂ = OLA(kc^T Xr − ks^T Xi)``
    (``ops.dispatch.synthesis_ola``'s convention); the factor 2 folded in
    recovers the real signal from its positive-band analytic part."""
    B = np.conj(np.fft.fft(np.conj(atoms), axis=1))
    G = (np.abs(B) ** 2).sum(0)
    g0 = G.max() * band_eta
    Dh = hop * np.conj(B) * (G > g0) / np.maximum(G, g0)
    d = np.fft.ifft(Dh, axis=1)
    return (jnp.asarray(2.0 * d.real, jnp.float32),
            jnp.asarray(2.0 * d.imag, jnp.float32))


def _warn_undersampled_hop(hop: int, lengths, context: str) -> None:
    """One warning for every inverse entry point: when ``hop`` exceeds half
    the shortest analysis atom, the top-octave subband envelopes are
    sampled below their bandwidth and the information loss is the FORWARD
    operator's (a CG least-squares solve converges to the same quality) —
    no inverse can recover it."""
    lmin = float(np.min(np.asarray(lengths)))
    if hop > lmin / 2:
        warnings.warn(
            f"{context}: hop_length={hop} exceeds half the shortest atom "
            f"({lmin:.0f}); top-octave envelopes are under-sampled and "
            "reconstruction quality degrades — use a smaller hop or fewer "
            "top bins"
        )


def _check_norm_type(normalization_type: str):
    if normalization_type not in ("librosa", "convolutional", "wrap"):
        raise ValueError(
            "The normalization_type %r is not part of our current options."
            % normalization_type
        )


class _FlatCQTInverse:
    """Mixin: canonical-dual inverse for the single-rate (flat-bank) CQT
    classes. The host class provides ``_inverse_atoms_flat(norm_type)``
    (the scaled complex analysis atoms such that ``X = x·A``), plus
    ``hop_length`` / ``kernel_width`` / ``center`` and a ``_dual_cache``
    dict initialized in ``__init__``."""

    def _dual_kernels(self, normalization_type, band_eta):
        """Canonical-dual synthesis kernels (fp64 at build, cached); the
        dual math and its η-regularization rationale live in
        :func:`_dual_synthesis_bank`."""
        cached = self._dual_cache.get((normalization_type, band_eta))
        if cached is not None:
            return cached
        kc, ks = _dual_synthesis_bank(
            self._inverse_atoms_flat(normalization_type),
            self.hop_length, band_eta)
        self._dual_cache[(normalization_type, band_eta)] = (kc, ks)
        return kc, ks

    def _refresh_derived(self, changed):
        # the dual bank is a function of the kernels AND lenghts — any
        # persistent param change invalidates it
        self._dual_cache.clear()

    def _inverse(self, X, kc, ks, length=None):
        from ..ops.dispatch import synthesis_ola

        # frames_t[s] = 2·Re{Σ_f X[f,t]·d_f[s]} = Σ_f (2dr·Xr − 2di·Xi):
        # exactly OLA(kc^T Xr − ks^T Xi), the existing fused synthesis op
        out = synthesis_ola(X[..., 0], X[..., 1], kc, ks, self.hop_length)
        if self.center:
            pad = self.kernel_width // 2
            out = out[:, pad: out.shape[-1] - pad]
        if length is not None:
            out = out[:, :length]
            if out.shape[-1] < length:
                out = jnp.pad(out, ((0, 0), (0, length - out.shape[-1])))
        return out

    def inverse(self, X, normalization_type="librosa", length=None,
                band_eta=1e-3):
        """Approximate inverse CQT (beyond-reference; librosa has ``icqt``,
        the reference has no way back from a CQT).

        Takes ``Complex``-format output ``(B, n_bins, T, 2)`` produced with
        the same ``normalization_type`` and reconstructs a waveform with
        canonical-dual synthesis atoms (see :meth:`_dual_kernels`): one
        fused matmul+OLA (ops/dispatch.synthesis_ola), measured 30-53 dB
        SNR on in-band material at well-overlapped hops.

        Two fundamental (operator, not implementation) limits: energy
        outside the covered band (fmin..fmin·2^(n_bins/bins_per_octave))
        was never captured by the forward; and the top-octave subbands are
        sampled at ``sr/hop`` — if ``hop`` exceeds half the SHORTEST atom
        (``lenghts.min()/2``) their envelopes alias irrecoverably (a
        least-squares CG solve was prototyped and converges to the same
        ~6 dB at hop=512/84 bins: the information is gone). A warning
        fires in that regime; the fix is a smaller hop or fewer top bins.

        Uses the FROZEN stored kernels (like ``STFT.inverse``); ``length``
        trims/pads the output. For magnitude-only inversion use
        :class:`~nnaudio_tpu.features.inverse_cqt.GriffinLimCQT`.
        """
        X = jnp.asarray(X)
        if X.ndim != 4 or X.shape[-1] != 2:
            raise AssertionError(
                "inverse expects Complex format (batch, n_bins, time, 2); "
                "for magnitude CQTs use GriffinLimCQT."
            )
        _check_norm_type(normalization_type)
        _warn_undersampled_hop(self.hop_length, self._params["lenghts"],
                               "inverse CQT")
        import functools

        from ..config import cache_salt

        key = ("inverse", normalization_type, band_eta, length, X.shape,
               cache_salt(self._salt_fields + ("use_pallas_synthesis",)))
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(self._inverse, length=length))
            self._jit_cache[key] = fn
        kc, ks = self._dual_kernels(normalization_type, band_eta)
        return fn(X, kc, ks)


class CQT1992(_FlatCQTInverse, SpectralTransform):
    """Original Brown–Puckette constant-Q transform: a rectangular-window
    Fourier stage followed by a frequency-domain complex matmul with FFT'd
    CQT kernels (reference ``cqt.py:9-256``). When neither stage is
    trainable, both linear maps are composed once at init (in fp64) into a
    single time-domain basis pair — one framed matmul instead of two.

    Input shapes ``(len_audio,)``, ``(num_audio, len_audio)`` or
    ``(num_audio, 1, len_audio)``.

    Parameters
    ----------
    sr : float
        Sampling rate of the input audio. Default 22050.
    hop_length : int
        Hop (stride) between frames in samples. Default 512.
    fmin : float
        Center frequency of the lowest CQT bin in Hz. Default 220.
    fmax : float or None
        If set, overrides ``n_bins``: bins are placed from ``fmin`` up to
        ``fmax`` at ``bins_per_octave`` per octave. Default ``None``.
    n_bins : int
        Total number of CQT bins. Default 84.
    bins_per_octave : int
        Frequency resolution: bins per octave. Default 12 (semitones).
    filter_scale : float
        Scales the kernel Q factor (``Q = filter_scale /
        (2^(1/bins_per_octave) - 1)``): < 1 shortens the wavelets (better
        time resolution), > 1 lengthens them. Default 1.
    norm : float
        Lp-norm used to normalize the wavelet kernels at construction. The
        reference notes it is otherwise "not functioning" (cqt.py:126).
        Default 1.
    window : str
        Window applied to each wavelet (``scipy.signal.get_window``).
        Default ``'hann'``.
    center : bool
        Center frames on their time index (pads ``kernel_width//2`` both
        sides). Default ``True``.
    pad_mode : {'reflect', 'constant'}
        Padding used when ``center=True``; reflect falls back to constant
        (with a warning) for signals shorter than the pad. Default
        ``'reflect'``.
    trainable_STFT : bool
        Make the Fourier-stage kernels leaf parameters (forces the
        two-stage path). Default ``False``.
    trainable_CQT : bool
        Make the frequency-domain CQT kernels leaf parameters (forces the
        two-stage path). Default ``False``.
    output_format : {'Magnitude', 'Complex', 'Phase'}
        Default output type; can be overridden per call, along with
        ``normalization_type`` in {'librosa', 'convolutional', 'wrap'}
        (librosa: ``sqrt(lenghts)/kernel_width`` scaling; convolutional:
        none; wrap: ``2/kernel_width``). Default ``'Magnitude'``.

    Returns
    -------
    spectrogram : jax.Array
        ``(num_audio, n_bins, time_steps)`` for Magnitude;
        ``(num_audio, n_bins, time_steps, 2)`` for Complex/Phase. The
        Phase output uses the raw un-negated, un-normalized pair — a
        reference quirk kept for parity (cqt.py:249-251).

    Examples
    --------
    >>> cqt_layer = CQT1992(sr=22050, fmin=220, n_bins=80,
    ...                     bins_per_octave=24)
    >>> spec = cqt_layer(x)
    """

    _salt_fields = ('matmul_precision', 'use_pallas', 'use_pallas_analysis')

    def __init__(
        self,
        sr: float = 22050,
        hop_length: int = 512,
        fmin: float = 220,
        fmax: float | None = None,
        n_bins: int = 84,
        trainable_STFT: bool = False,
        trainable_CQT: bool = False,
        bins_per_octave: int = 12,
        filter_scale: float = 1,
        output_format: str = "Magnitude",
        norm: float = 1,
        window: str = "hann",
        center: bool = True,
        pad_mode: str = "reflect",
    ):
        super().__init__()
        self.hop_length = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.output_format = output_format
        self.trainable = trainable_STFT or trainable_CQT
        self._dual_cache: dict = {}

        Q = float(filter_scale) / (2 ** (1 / bins_per_octave) - 1)
        bank = create_cqt_kernels(
            Q, sr, fmin, n_bins, bins_per_octave, norm, window, fmax
        )
        self.kernel_width = bank.fft_len
        self.frequencies = bank.freqs
        self._register("lenghts", bank.lengths)

        # kernels to the frequency domain, keep the onesided half (cqt.py:145)
        fft_kernels = np.fft.fft(bank.kernels, axis=1)[:, : self.kernel_width // 2 + 1]
        self._register("cqt_kernels_real", fft_kernels.real.astype(np.float32),
                       trainable=trainable_CQT)
        self._register("cqt_kernels_imag", fft_kernels.imag.astype(np.float32),
                       trainable=trainable_CQT)

        fourier = create_fourier_basis(
            self.kernel_width, window="ones", freq_scale="no"
        )
        self.bins2freq = fourier.bins2freq
        self._register("wsin", fourier.wsin * fourier.window_mask[None, :],
                       trainable=trainable_STFT)
        self._register("wcos", fourier.wcos * fourier.window_mask[None, :],
                       trainable=trainable_STFT)

        if not self.trainable:
            # both stages are linear maps — compose them once at init (in
            # fp64) into a single (n_bins, kernel_width) time-domain basis
            # pair: real = (kr Wcos - ki Wsin) x, imag = (kr Wsin + ki Wcos) x
            kr = fft_kernels.real.astype(np.float64)
            ki = fft_kernels.imag.astype(np.float64)
            wc = (fourier.wcos * fourier.window_mask[None, :]).astype(np.float64)
            ws = (fourier.wsin * fourier.window_mask[None, :]).astype(np.float64)
            self._register("combined_real", (kr @ wc - ki @ ws).astype(np.float32))
            self._register("combined_imag", (kr @ ws + ki @ wc).astype(np.float32))

    def _forward(self, params, x, output_format=None, normalization_type="librosa"):
        output_format = output_format or self.output_format
        _check_norm_type(normalization_type)
        x = broadcast_dim(x)
        if self.center:
            x = _center_pad(x, self.kernel_width // 2, self.pad_mode)

        if not self.trainable:
            if output_format == "Magnitude":
                mag = framed_magnitude(
                    x, params["combined_real"], params["combined_imag"],
                    self.hop_length,
                )
                if normalization_type == "librosa":
                    return mag * (jnp.sqrt(params["lenghts"])[None, :, None]
                                  / self.kernel_width)
                if normalization_type == "wrap":
                    return mag * (2 / self.kernel_width)
                return mag
            cqt_real, cqt_imag = framed_basis_pair(
                x, params["combined_real"], params["combined_imag"],
                self.hop_length,
            )
        else:
            fourier_real, fourier_imag = framed_basis_pair(
                x, params["wcos"], params["wsin"], self.hop_length
            )
            cqt_real, cqt_imag = complex_bank_mul(
                params["cqt_kernels_real"],
                params["cqt_kernels_imag"],
                fourier_real,
                fourier_imag,
            )

        # normalized components carry the reference's (real, -imag) stack
        real_n, imag_n = cqt_real, -cqt_imag
        if normalization_type == "librosa":
            scale = jnp.sqrt(params["lenghts"])[None, :, None] / self.kernel_width
            real_n, imag_n = real_n * scale, imag_n * scale
        elif normalization_type == "wrap":
            real_n, imag_n = real_n * (2 / self.kernel_width), imag_n * (2 / self.kernel_width)

        if output_format == "Phase":
            # quirk: Phase uses the raw, un-negated, un-normalized pair
            # (cqt.py:249-251)
            return phase_unit_stack(cqt_real, cqt_imag)
        return _cqt_output(real_n, imag_n, output_format, trainable=False)

    def __call__(self, x, output_format=None, normalization_type="librosa"):
        return self.apply(
            None, x, output_format=output_format or self.output_format,
            normalization_type=normalization_type,
        )

    def _norm_scale_np(self, normalization_type):
        n = self._params["lenghts"].shape[0]
        if normalization_type == "librosa":
            return (np.sqrt(np.asarray(self._params["lenghts"], np.float64))
                    / self.kernel_width)
        if normalization_type == "wrap":
            return np.full((n,), 2.0 / self.kernel_width)
        return np.ones((n,))

    def _inverse_atoms_flat(self, normalization_type):
        # the composed frozen basis keeps the negated-imag Complex
        # convention (real_n, -cqt_imag above): X = σ(x·Cr) − i·σ(x·Ci)
        if "combined_real" not in self._params:
            raise NotImplementedError(
                "CQT1992.inverse needs the frozen composed basis "
                "(trainable_STFT=trainable_CQT=False)")
        cr = np.asarray(self._params["combined_real"], np.float64)
        ci = np.asarray(self._params["combined_imag"], np.float64)
        return self._norm_scale_np(normalization_type)[:, None] * (cr - 1j * ci)

    def extra_repr(self) -> str:
        return "STFT kernel size = {}, CQT kernel size = {}".format(
            tuple(self._params["wcos"].shape),
            tuple(self._params["cqt_kernels_real"].shape),
        )


class CQT1992v2(_FlatCQTInverse, SpectralTransform):
    """Direct time-domain constant-Q transform: one framed matmul of the
    signal against complex log-spaced wavelets (reference ``cqt.py:561-802``;
    this is what the :class:`CQT` alias resolves to). On TPU the Magnitude
    path runs as the fused Pallas frame+matmul+magnitude kernel.

    Input shapes ``(len_audio,)``, ``(num_audio, len_audio)`` or
    ``(num_audio, 1, len_audio)``.

    Parameters
    ----------
    sr : float
        Sampling rate of the input audio. Default 22050.
    hop_length : int
        Hop (stride) between frames in samples. Default 512.
    fmin : float
        Center frequency of the lowest bin in Hz. Default 32.70 (C1).
    fmax : float or None
        If set, overrides ``n_bins`` (bins from ``fmin`` to ``fmax``).
        Default ``None``.
    n_bins : int
        Total number of CQT bins. Default 84 (7 octaves at 12/octave).
    bins_per_octave : int
        Bins per octave. Default 12.
    filter_scale : float
        Q-factor scale for the wavelet lengths; < 1 trades frequency for
        time resolution. Default 1.
    norm : float
        Lp-norm for kernel normalization at construction. Default 1.
    window : str or tuple
        Wavelet window (``scipy.signal.get_window``); tuples like
        ``('gaussian', 50)`` work. Default ``'hann'``.
    center : bool
        Center frames on their time index (pads ``kernel_width//2`` both
        sides). Default ``True``.
    pad_mode : {'reflect', 'constant'}
        Padding when ``center=True`` (reflect falls back to constant, with
        a warning, for short signals). Default ``'reflect'``.
    trainable : bool
        Make the wavelet banks leaf parameters; gradients flow through the
        framed-matmul custom VJP. Default ``False``.
    output_format : {'Magnitude', 'Complex', 'Phase'}
        Default output type; overridable per call together with
        ``normalization_type`` in {'librosa', 'convolutional', 'wrap'}.
        Default ``'Magnitude'``.
    verbose : bool
        Print kernel-construction info. Default ``True``.

    Returns
    -------
    spectrogram : jax.Array
        ``(num_audio, n_bins, time_steps)`` for Magnitude;
        ``(num_audio, n_bins, time_steps, 2)`` for Complex/Phase (Phase
        keeps the reference's un-negated convention, cqt.py:793-800).
        ``forward_manual(x)`` additionally exposes the reference's
        manual-normalization variant (``* sqrt(lenghts)``).

    Examples
    --------
    >>> cqt_layer = CQT1992v2(sr=22050, hop_length=512, n_bins=84)
    >>> spec = cqt_layer(x)
    """

    _salt_fields = ('matmul_precision', 'use_pallas', 'use_pallas_analysis')

    def __init__(
        self,
        sr: float = 22050,
        hop_length: int = 512,
        fmin: float = 32.70,
        fmax: float | None = None,
        n_bins: int = 84,
        bins_per_octave: int = 12,
        filter_scale: float = 1,
        norm: float = 1,
        window="hann",
        center: bool = True,
        pad_mode: str = "reflect",
        trainable: bool = False,
        output_format: str = "Magnitude",
        verbose: bool = True,
    ):
        super().__init__()
        self.trainable = trainable
        self.hop_length = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.output_format = output_format
        #: lazily-built canonical-dual synthesis kernels for inverse(),
        #: keyed (normalization_type, band_eta); cleared when kernels change
        self._dual_cache: dict = {}

        Q = float(filter_scale) / (2 ** (1 / bins_per_octave) - 1)
        bank = create_cqt_kernels(
            Q, sr, fmin, n_bins, bins_per_octave, norm, window, fmax
        )
        self.kernel_width = bank.fft_len
        self.frequencies = bank.freqs
        self._register("lenghts", bank.lengths)
        self._register("cqt_kernels_real", bank.kernels.real.astype(np.float32),
                       trainable=trainable)
        self._register("cqt_kernels_imag", bank.kernels.imag.astype(np.float32),
                       trainable=trainable)
        self._verbose_print(
            verbose,
            f"CQT kernels created: {bank.kernels.shape} (width={self.kernel_width})",
        )

    def _forward(self, params, x, output_format=None, normalization_type="librosa"):
        output_format = output_format or self.output_format
        _check_norm_type(normalization_type)
        x = broadcast_dim(x)
        if self.center:
            x = _center_pad(x, self.kernel_width // 2, self.pad_mode)

        if output_format == "Magnitude" and not self.trainable:
            # |(r, -i)| == |(r, i)| and the normalizations are positive
            # per-bin scales, so the fused magnitude kernel applies directly
            mag = framed_magnitude(
                x, params["cqt_kernels_real"], params["cqt_kernels_imag"],
                self.hop_length,
            )
            if normalization_type == "librosa":
                return mag * jnp.sqrt(params["lenghts"])[None, :, None]
            if normalization_type == "wrap":
                return mag * 2
            return mag

        if output_format == "Complex":
            # fused stacked-Complex with the normalization scale folded into
            # the kernel's interleaved store (cqt.py:766-775)
            if normalization_type == "librosa":
                scale = jnp.sqrt(params["lenghts"])
            elif normalization_type == "wrap":
                scale = jnp.full(
                    (params["cqt_kernels_real"].shape[0],), 2.0, jnp.float32)
            else:
                scale = None
            return framed_complex(
                x, params["cqt_kernels_real"], params["cqt_kernels_imag"],
                scale, self.hop_length,
            )

        real, imag_raw = framed_basis_pair(
            x, params["cqt_kernels_real"], params["cqt_kernels_imag"], self.hop_length
        )
        imag = -imag_raw  # cqt.py:750

        if normalization_type == "librosa":
            scale = jnp.sqrt(params["lenghts"])[None, :, None]
            real, imag = real * scale, imag * scale
        elif normalization_type == "wrap":
            real, imag = real * 2, imag * 2

        return _cqt_output(real, imag, output_format, trainable=self.trainable)

    def __call__(self, x, output_format=None, normalization_type="librosa"):
        return self.apply(
            None, x, output_format=output_format or self.output_format,
            normalization_type=normalization_type,
        )

    def _norm_scale_np(self, normalization_type):
        if normalization_type == "librosa":
            return np.sqrt(np.asarray(self._params["lenghts"], np.float64))
        if normalization_type == "wrap":
            return np.full((self._params["cqt_kernels_real"].shape[0],), 2.0)
        return np.ones((self._params["cqt_kernels_real"].shape[0],))

    def _inverse_atoms_flat(self, normalization_type):
        # time-domain bank with the negated-imag convention:
        # X = σ(x·Kr) − i·σ(x·Ki) ⇒ A = σ(Kr − i·Ki)
        kr = np.asarray(self._params["cqt_kernels_real"], np.float64)
        ki = np.asarray(self._params["cqt_kernels_imag"], np.float64)
        return self._norm_scale_np(normalization_type)[:, None] * (kr - 1j * ki)

    def forward_manual(self, x):
        """Debug path matching cqt.py:782-802: un-negated imag, magnitude
        scaled by sqrt(lengths)."""
        x = broadcast_dim(jnp.asarray(x))
        if self.center:
            x = _center_pad(x, self.kernel_width // 2, self.pad_mode)
        real, imag = framed_basis_pair(
            x,
            self._params["cqt_kernels_real"],
            self._params["cqt_kernels_imag"],
            self.hop_length,
        )
        mag = jnp.sqrt(real * real + imag * imag)
        return mag * jnp.sqrt(self._params["lenghts"])[None, :, None]

    def extra_repr(self) -> str:
        return "CQT kernel size = {}, trainable = {}".format(
            tuple(self._params["cqt_kernels_real"].shape), self.trainable
        )


class CQT(CQT1992v2):
    """Alias of :class:`CQT1992v2` (reference cqt.py:1142-1145)."""


class _PyramidCQT(SpectralTransform):
    """Shared init machinery for the 2010 multi-octave pyramid
    (reference cqt.py:277-436 / 899-1069): octave count, top-octave band
    placement, early-downsample calculus, lowpass FIR, per-bin lengths."""

    _salt_fields = ("matmul_precision", "use_pallas", "use_pallas_analysis",
                    "use_fused_pyramid", "use_parallel_chain")

    def __init__(self):
        super().__init__()
        #: lazily-built pyramid dual-synthesis kernels for inverse(),
        #: keyed (normalization_type, band_eta); cleared on any param change
        self._dual_cache: dict = {}

    def _init_pyramid(
        self,
        sr,
        hop_length,
        fmin,
        fmax,
        n_bins,
        bins_per_octave,
        filter_scale,
        earlydownsample,
        verbose,
    ):
        Q = float(filter_scale) / (2 ** (1 / bins_per_octave) - 1)
        lowpass = create_lowpass_filter(
            band_center=0.5, kernel_length=256, transition_bandwidth=0.001
        )
        self._register("lowpass_filter", lowpass)

        n_filters = min(bins_per_octave, n_bins)
        self.n_octaves = int(np.ceil(float(n_bins) / bins_per_octave))

        # composed cascade filters for the parallel chain: DERIVED state —
        # a pure function of lowpass_filter (cascade_1 == the filter
        # itself, so they start at 2), so they live in self._derived and
        # are recomputed whenever the FIR changes, never saved/loaded.
        # ~2*taps*2^k floats total — trivial next to the kernel banks.
        self._lowpass_pad = (lowpass.shape[-1] - 1) // 2
        self._refresh_derived({"lowpass_filter"})
        self._verbose_print(verbose, f"num_octave = {self.n_octaves}")

        self.fmin_t = fmin * 2 ** (self.n_octaves - 1)
        remainder = n_bins % bins_per_octave
        if remainder == 0:
            fmax_t = self.fmin_t * 2 ** ((bins_per_octave - 1) / bins_per_octave)
        else:
            fmax_t = self.fmin_t * 2 ** ((remainder - 1) / bins_per_octave)
        self.fmin_t = fmax_t / 2 ** (1 - 1 / bins_per_octave)
        if fmax_t > sr / 2:
            raise ValueError(
                f"The top bin {fmax_t}Hz has exceeded the Nyquist frequency, "
                "please reduce the n_bins"
            )

        if earlydownsample:
            new_sr, new_hop, factor, filt, active = early_downsample_params(
                sr, hop_length, fmax_t, Q, self.n_octaves
            )
            self.earlydownsample = active
            self.downsample_factor = factor
            if active:
                self._verbose_print(
                    verbose, f"Early downsample active, factor = {factor}"
                )
                sr, hop_length = new_sr, new_hop
                self._register("early_downsample_filter", filt)
        else:
            self.earlydownsample = False
            self.downsample_factor = 1.0

        self.hop_length = hop_length
        if hop_length % 2 ** (self.n_octaves - 1):
            # the per-octave chain floor-divides the hop (reference
            # cqt.py:1094, vqt.py:165) — deep octaves then disagree on frame
            # counts for most signal lengths (opaque concat errors, as in
            # the reference) or silently time-misalign. Surface it at
            # construction time; behavior is unchanged (parity).
            warnings.warn(
                f"hop_length={hop_length} (after early downsampling) is not "
                f"a multiple of 2**(n_octaves-1) = {2 ** (self.n_octaves - 1)}"
                "; per-octave hops will floor-divide, which breaks or "
                "misaligns the deepest octaves for most input lengths"
            )
        return Q, sr, n_filters

    def _refresh_derived(self, changed):
        # any persistent param change invalidates the inverse's dual bank
        # (it is a function of the kernels, the chain filters AND lenghts)
        self._dual_cache.clear()
        # fp64 recomposition whenever the base FIR changes persistently
        # (init, update_params, load_state_dict) — including legacy
        # snapshots that stored the cascades: they are accepted by
        # load_state_dict but always rebuilt from the loaded filter here
        if "lowpass_filter" not in changed:
            return
        fir = np.asarray(self._params["lowpass_filter"], np.float64)
        for k in range(2, self.n_octaves):
            self._derived[f"lowpass_cascade_{k}"] = jnp.asarray(
                compose_cascade(fir, k).astype(np.float32)
            )

    def _rederive(self, merged, overridden):
        # apply-time lowpass_filter override: recompose in-graph so the
        # parallel chain tracks the override (tracer-safe; gradients flow
        # through the composition if the override is being differentiated)
        if "lowpass_filter" in overridden:
            for k in range(2, self.n_octaves):
                merged[f"lowpass_cascade_{k}"] = compose_cascade_jnp(
                    merged["lowpass_filter"], k
                )
        return merged

    # ------------------------------------------------------------ inverse --
    def _inverse_atoms(self):
        """Per-level complex analysis atoms ``A`` (``X_level = x_level·A``)
        and per-level center pads — subclass hook for the pyramid inverse."""
        raise NotImplementedError

    def _inverse_scale(self, normalization_type):
        """Per-bin output scale of the forward (fp64 numpy). Default: the
        CQT2010v2/VQT convention (downsample_factor fold plus the
        normalization-type scale); CQT2010 overrides (reference parity: no
        factor fold, 1/n_fft on librosa/wrap)."""
        F = float(self.downsample_factor)
        if normalization_type == "librosa":
            return F * np.sqrt(np.asarray(self._params["lenghts"],
                                          np.float64))
        if normalization_type == "wrap":
            return np.full(self.n_bins, 2.0 * F)
        return np.full(self.n_bins, F)

    def _pyramid_dual_kernels(self, normalization_type, band_eta):
        """Canonical-dual synthesis bank for the WHOLE pyramid, built by
        collapsing the multirate analysis to a single-rate frame: octave
        ``j`` analyzes the 2^j-decimated signal at hop ``hop/2^j``, which
        in original-rate terms is a frame at the ORIGINAL hop whose
        effective atom is ``H_j ∗ ↑2^j A_f`` (the composed decimation
        cascade convolved with the zero-stuffed bank atom), shifted by the
        accumulated pads ``c_j = 2^j·P_j + p(2^j−1)`` (+ the early-downsample
        stage when active). One dual construction over the embedded
        effective bank then inverts every octave at once — same math and
        η-regularization as ``CQT1992v2._dual_kernels``."""
        cached = self._dual_cache.get((normalization_type, band_eta))
        if cached is not None:
            return cached
        from scipy.signal import fftconvolve

        level_atoms, level_pads = self._inverse_atoms()
        lowpass = np.asarray(self._params["lowpass_filter"], np.float64)
        p = self._lowpass_pad
        early = self.earlydownsample
        F = int(self.downsample_factor) if early else 1
        eff, offs = [], []
        for j in range(self.n_octaves):
            A = level_atoms[j]
            if j == 0:
                e, c = A, int(level_pads[0])
            else:
                H = compose_cascade(lowpass, j)
                up = np.zeros((A.shape[0], (A.shape[1] - 1) * 2 ** j + 1),
                              np.complex128)
                up[:, :: 2 ** j] = A
                e = fftconvolve(up, H[None, :], mode="full", axes=1)
                c = 2 ** j * int(level_pads[j]) + p * (2 ** j - 1)
            if early:
                Ef = np.asarray(self._params["early_downsample_filter"],
                                np.float64)
                up = np.zeros((e.shape[0], (e.shape[1] - 1) * F + 1),
                              np.complex128)
                up[:, ::F] = e
                e = fftconvolve(up, Ef[None, :], mode="full", axes=1)
                c = F * c + (Ef.shape[-1] - 1) // 2
            eff.append(e)
            offs.append(c)
        hop_top = self.hop_length * F
        C = max(offs)
        w_eff = max(C - c + e.shape[1] for e, c in zip(eff, offs))
        rows = []  # deepest octave first, matching the forward's concat
        for j in reversed(range(self.n_octaves)):
            full = np.zeros((eff[j].shape[0], w_eff), np.complex128)
            start = C - offs[j]
            full[:, start: start + eff[j].shape[1]] = eff[j]
            rows.append(full)
        atoms = np.concatenate(rows, axis=0)[-self.n_bins:]
        atoms = atoms * self._inverse_scale(normalization_type)[:, None]
        kc, ks = _dual_synthesis_bank(atoms, hop_top, band_eta)
        out = (kc, ks, C, hop_top)
        self._dual_cache[(normalization_type, band_eta)] = out
        return out

    def _inverse_graph(self, X, kc, ks, start, hop_top, length):
        from ..ops.dispatch import synthesis_ola

        out = synthesis_ola(X[..., 0], X[..., 1], kc, ks, hop_top)
        natural = hop_top * (X.shape[2] - 1)
        want = natural if length is None else length
        out = out[:, start: start + want]
        if out.shape[-1] < want:
            out = jnp.pad(out, ((0, 0), (0, want - out.shape[-1])))
        return out

    def inverse(self, X, normalization_type="librosa", length=None,
                band_eta=1e-3):
        """Approximate inverse for the multi-octave pyramid families
        (beyond-reference; the librosa ``icqt`` analog for CQT2010v2/VQT).

        Takes ``Complex``-format output ``(B, n_bins, T, 2)`` produced with
        the same ``normalization_type``. The whole multirate pyramid is
        collapsed into ONE single-rate dual-synthesis matmul+OLA (see
        :meth:`_pyramid_dual_kernels`); the reconstruction is at the
        ORIGINAL sample rate even when early downsampling was active (the
        early FIR is part of the composed atoms). Same quality contract as
        ``CQT1992v2.inverse``: keep the (post-early-downsample) hop at or
        below half the shortest atom or the top octave aliases (warned).
        Interior-exact up to the per-stage edge effects of the serial
        decimation chain (≤127 samples per level edge)."""
        X = jnp.asarray(X)
        if X.ndim != 4 or X.shape[-1] != 2:
            raise AssertionError(
                "inverse expects Complex format (batch, n_bins, time, 2)"
            )
        _check_norm_type(normalization_type)
        _warn_undersampled_hop(self.hop_length, self._params["lenghts"],
                               "inverse CQT (post early downsampling)")
        import functools

        from ..config import cache_salt

        kc, ks, start, hop_top = self._pyramid_dual_kernels(
            normalization_type, band_eta)
        key = ("inverse", normalization_type, band_eta, length, X.shape,
               cache_salt(self._salt_fields + ("use_pallas_synthesis",)))
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                self._inverse_graph, start=start, hop_top=hop_top,
                length=length))
            self._jit_cache[key] = fn
        return fn(X, kc, ks)

    def _pyramid_chain(self, params, x):
        """Downsampled signal + hop per octave, top octave first — the chain
        is shared by the fused whole-pyramid path and the per-octave loop.

        Two implementations of the same arithmetic (config
        ``use_parallel_chain``): the reference's serial per-octave
        lowpass+decimate (cqt.py:1097-1103), or every level computed
        directly from ``x`` with a composed cascade filter
        (core/resample.compose_cascade) — independent MXU-sized matmuls
        instead of 7 serial shrinking ops; exact up to fp32 reassociation."""
        hop = self.hop_length
        hops = [hop]
        for _ in range(self.n_octaves - 1):
            hop //= 2
            hops.append(hop)
        if parallel_chain_enabled() and self.n_octaves > 1:
            return self._parallel_levels(params, x), hops
        levels, x_down = [x], x
        for _ in range(self.n_octaves - 1):
            x_down = downsample_by_n(x_down, params["lowpass_filter"], 2)
            levels.append(x_down)
        return levels, hops

    # The serial chain zero-pads each stage by p=127 AND truncates each
    # stage's output to floor(L/2) BEFORE the next stage reads it — so the
    # first/last <=127 samples of every level are functions of injected
    # zeros, not of the composed linear operator on x. The composed matmuls
    # are exact on the interior; the two edges are re-derived serially from
    # the previous CORRECTED level (tiny ops: _EDGE_FIX outputs each).
    _EDGE_FIX = 192  # > the 127-sample fixed point of the edge recursion

    def _parallel_levels(self, params, x):
        """All pyramid levels computed directly from the top-rate signal:
        one big independent banded matmul per level (composed cascade
        filter, core/resample.compose_cascade) + serial head/tail edge
        corrections. Bit-compatible with the serial chain up to fp32
        reassociation (tested: test_parallel_chain_matches_serial_*)."""
        fir = params["lowpass_filter"]
        taps = fir.shape[-1]
        p = self._lowpass_pad
        e0 = self._EDGE_FIX
        comp = [x]
        for k in range(1, self.n_octaves):
            firk = fir if k == 1 else params[f"lowpass_cascade_{k}"]
            comp.append(downsample_by_n(x, firk, 2**k, pad=p * (2**k - 1)))
        levels = [x]
        for k in range(1, self.n_octaves):
            if k == 1:
                # comp[1] (base fir, pad=p) IS the serial stage call —
                # zero edge contamination, no fixup work needed for the
                # largest level
                levels.append(comp[1])
                continue
            prev, lc = levels[k - 1], comp[k].shape[-1]
            if lc == 0 or 2 * min(e0, lc) >= lc:
                # level (nearly) inside the fixup window: plain serial stage
                levels.append(downsample_by_n(prev, fir, 2))
                continue
            e = min(e0, lc)
            # head: the standard stage conv only needs prev's prefix
            head = downsample_by_n(prev[:, : 2 * (e - 1) + p + 2], fir, 2)
            head = head[:, :e]
            # tail: valid conv over prev's suffix with the serial chain's
            # zero extension beyond len(prev) reproduced explicitly
            start = lc - e
            a = 2 * start - p
            need = 2 * (e - 1) + taps
            w = prev[:, max(a, 0):]
            lpad = max(0, -a)
            rpad = need - lpad - w.shape[-1]
            w = jnp.pad(w, ((0, 0), (lpad, max(rpad, 0))))
            if rpad < 0:
                w = w[:, :need]
            tail = downsample_by_n(w, fir, 2, pad=0)
            levels.append(
                jnp.concatenate([head, comp[k][:, e:start], tail], axis=-1)
            )
        return levels

    def _fused_pyramid(self, levels, hops, bank_real, bank_imag):
        """One batched contraction for every octave (ops/pyramid.py): the
        2010-family shares a single top-octave bank, applied deepest level
        first to match the reference's bin assembly. ``None`` when the
        fused path's static preconditions fail."""
        if not pyramid_enabled():
            return None
        n = self.n_octaves
        padded = [
            _center_pad(lv, self.n_fft // 2, self.pad_mode) for lv in levels
        ]
        return pyramid_basis_pair(
            padded[::-1], [bank_real] * n, [bank_imag] * n, hops[::-1]
        )


class CQT2010(_PyramidCQT):
    """Schörkhuber–Klapuri multi-octave CQT with a frequency-domain
    top-octave bank: per octave, a rectangular-window Fourier stage +
    complex matmul with the FFT'd kernels; between octaves the signal is
    lowpass-filtered and downsampled by 2, halving the effective hop
    (reference ``cqt.py:259-558``). Frozen stages are composed into a
    single per-octave basis at init.

    Unlike the 1992 family there is no ``center`` switch — the signal is
    always padded by ``n_fft//2`` per octave (cqt.py:474-478).

    Parameters
    ----------
    sr : float
        Sampling rate. Default 22050.
    hop_length : int
        Hop at the original sample rate; each deeper octave sees it halved.
        Must be a multiple of ``2^(n_octaves-1)``. Default 512.
    fmin : float
        Lowest bin center frequency in Hz. Default 32.70.
    fmax : float or None
        If set, overrides ``n_bins``. Default ``None``.
    n_bins : int
        Total bins. Default 84.
    bins_per_octave : int
        Bins per octave. Default 12.
    norm : bool
        Normalize the output by the kernel lengths (the reference's
        ``norm`` flag). Default ``True``.
    basis_norm : float
        Lp-norm for the kernel bank at construction. Default 1.
    window : str
        Wavelet window. Default ``'hann'``.
    pad_mode : {'reflect', 'constant'}
        Per-octave padding mode. Default ``'reflect'``.
    trainable_STFT, trainable_CQT : bool
        Make the Fourier stage / CQT kernel bank leaf parameters (keeps the
        two-stage per-octave path). Defaults ``False``.
    filter_scale : float
        Q-factor scale. Default 1.
    earlydownsample : bool
        Pre-decimate the input when the top octave's Nyquist allows it
        (the reference's early-downsampling optimization, cqt.py:296-343).
        Default ``True``.
    output_format : {'Magnitude', 'Complex', 'Phase'}
        Default output type; overridable per call with
        ``normalization_type``. Default ``'Magnitude'``.
    verbose : bool
        Print kernel-construction info. Default ``True``.

    Returns
    -------
    spectrogram : jax.Array
        ``(num_audio, n_bins, time_steps)`` Magnitude or
        ``(num_audio, n_bins, time_steps, 2)`` Complex/Phase.

    Examples
    --------
    >>> cqt_layer = CQT2010(sr=22050, n_bins=160, bins_per_octave=24)
    >>> spec = cqt_layer(x)
    """

    def __init__(
        self,
        sr: float = 22050,
        hop_length: int = 512,
        fmin: float = 32.70,
        fmax: float | None = None,
        n_bins: int = 84,
        bins_per_octave: int = 12,
        norm: bool = True,
        basis_norm: float = 1,
        window: str = "hann",
        pad_mode: str = "reflect",
        trainable_STFT: bool = False,
        filter_scale: float = 1,
        trainable_CQT: bool = False,
        output_format: str = "Magnitude",
        earlydownsample: bool = True,
        verbose: bool = True,
    ):
        super().__init__()
        self.norm = norm
        self.pad_mode = pad_mode
        self.n_bins = n_bins
        self.output_format = output_format
        self.trainable = trainable_STFT or trainable_CQT

        Q, sr_eff, n_filters = self._init_pyramid(
            sr, hop_length, fmin, fmax, n_bins, bins_per_octave, filter_scale,
            earlydownsample, verbose,
        )

        bank = create_cqt_kernels(
            Q, sr_eff, self.fmin_t, n_filters, bins_per_octave,
            norm=basis_norm, topbin_check=False,
        )
        self.n_fft = bank.fft_len

        freqs = fmin * 2.0 ** (np.arange(n_bins) / np.double(bins_per_octave))
        self.frequencies = freqs
        self._register("lenghts", np.ceil(Q * sr_eff / freqs).astype(np.float32))

        fft_basis = np.fft.fft(bank.kernels, axis=1)[:, : self.n_fft // 2 + 1]
        self._register("cqt_kernels_real", fft_basis.real.astype(np.float32),
                       trainable=trainable_CQT)
        self._register("cqt_kernels_imag", fft_basis.imag.astype(np.float32),
                       trainable=trainable_CQT)

        fourier = create_fourier_basis(self.n_fft, window="ones", freq_scale="no")
        self.bins2freq = fourier.bins2freq
        self._register("wsin", fourier.wsin * fourier.window_mask[None, :],
                       trainable=trainable_STFT)
        self._register("wcos", fourier.wcos * fourier.window_mask[None, :],
                       trainable=trainable_STFT)

        if not self.trainable:
            # compose the per-octave Fourier stage and complex mul into one
            # time-domain basis pair (fp64 at init) — same trick as CQT1992
            kr = fft_basis.real.astype(np.float64)
            ki = fft_basis.imag.astype(np.float64)
            wc = (fourier.wcos * fourier.window_mask[None, :]).astype(np.float64)
            ws = (fourier.wsin * fourier.window_mask[None, :]).astype(np.float64)
            self._register("combined_real", (kr @ wc - ki @ ws).astype(np.float32))
            self._register("combined_imag", (kr @ ws + ki @ wc).astype(np.float32))

    def _octave_cqt(self, params, x, hop):
        """Fourier stage + frequency-domain complex mul; the reference's
        ``get_cqt_complex2`` with wcos/wsin (utils.py:524-559) — note the
        un-negated stack."""
        x = _center_pad(x, self.n_fft // 2, self.pad_mode)
        if not self.trainable:
            return framed_basis_pair(
                x, params["combined_real"], params["combined_imag"], hop
            )
        fr, fi = framed_basis_pair(x, params["wcos"], params["wsin"], hop)
        return complex_bank_mul(
            params["cqt_kernels_real"], params["cqt_kernels_imag"], fr, fi
        )

    def _forward(self, params, x, output_format=None, normalization_type="librosa"):
        output_format = output_format or self.output_format
        _check_norm_type(normalization_type)
        x = broadcast_dim(x)
        if self.earlydownsample:
            x = downsample_by_n(
                x, params["early_downsample_filter"], int(self.downsample_factor)
            )
        levels, hops = self._pyramid_chain(params, x)
        fused = None
        if not self.trainable:
            fused = self._fused_pyramid(
                levels, hops, params["combined_real"], params["combined_imag"]
            )
        if fused is not None:
            real, imag = fused  # un-negated stack (utils.py:548-559)
        else:
            real, imag = self._octave_cqt(params, levels[0], hops[0])
            for lv, h in zip(levels[1:], hops[1:]):
                r1, i1 = self._octave_cqt(params, lv, h)
                real = jnp.concatenate((r1, real), axis=1)
                imag = jnp.concatenate((i1, imag), axis=1)

        real, imag = real[:, -self.n_bins :], imag[:, -self.n_bins :]

        if normalization_type == "librosa":
            scale = jnp.sqrt(params["lenghts"])[None, :, None] / self.n_fft
            real, imag = real * scale, imag * scale
        elif normalization_type == "wrap":
            real, imag = real * (2 / self.n_fft), imag * (2 / self.n_fft)

        return _cqt_output(real, imag, output_format, trainable=False)

    def __call__(self, x, output_format=None, normalization_type="librosa"):
        return self.apply(
            None, x, output_format=output_format or self.output_format,
            normalization_type=normalization_type,
        )

    def _inverse_atoms(self):
        # the composed frozen basis carries the UN-negated convention
        # (utils.py:548-559): X = x·Cr + i·(x·Ci), so the atom is Cr + i·Ci
        if "combined_real" not in self._params:
            raise NotImplementedError(
                "CQT2010.inverse needs the frozen composed basis "
                "(trainable=False)")
        cr = np.asarray(self._params["combined_real"], np.float64)
        ci = np.asarray(self._params["combined_imag"], np.float64)
        return ([cr + 1j * ci] * self.n_octaves,
                [self.n_fft // 2] * self.n_octaves)

    def _inverse_scale(self, normalization_type):
        # reference parity quirks of this legacy class: no downsample_factor
        # fold, and the 1/n_fft Fourier-stage normalization on librosa/wrap
        if normalization_type == "librosa":
            return (np.sqrt(np.asarray(self._params["lenghts"], np.float64))
                    / self.n_fft)
        if normalization_type == "wrap":
            return np.full(self.n_bins, 2.0 / self.n_fft)
        return np.ones(self.n_bins)

    def extra_repr(self) -> str:
        return "STFT kernel size = {}, CQT kernel size = {}".format(
            tuple(self._params["wcos"].shape),
            tuple(self._params["cqt_kernels_real"].shape),
        )


class CQT2010v2(_PyramidCQT):
    """Multi-octave CQT pyramid with time-domain top-octave kernels
    (reference ``cqt.py:805-1139``): each octave applies a direct framed
    matmul with the complex wavelets of the TOP octave (the bank is shared —
    deeper octaves reuse it on the downsampled signal), with lowpass
    decimation by 2 between octaves and optional early downsampling of the
    input. This is the librosa-equivalent fast CQT and the engine behind
    :class:`~nnaudio_tpu.features.VQT`.

    Parameters
    ----------
    sr : float
        Sampling rate. Default 22050.
    hop_length : int
        Hop at the original rate; halves per octave, so it must be a
        multiple of ``2^(n_octaves-1)``. Default 512.
    fmin : float
        Lowest bin center frequency in Hz. Default 32.70.
    fmax : float or None
        If set, overrides ``n_bins``. Default ``None``.
    n_bins : int
        Total bins. Default 84.
    filter_scale : float
        Q-factor scale. Default 1.
    bins_per_octave : int
        Bins per octave. Default 12.
    norm : bool
        Normalize output by kernel lengths. Default ``True``.
    basis_norm : float
        Lp-norm for kernel construction. Default 1.
    window : str
        Wavelet window. Default ``'hann'``.
    pad_mode : {'reflect', 'constant'}
        Per-octave padding mode. Default ``'reflect'``.
    earlydownsample : bool
        Pre-decimate the input when possible. Default ``True``.
    trainable : bool
        Make the shared top-octave wavelet bank a leaf parameter. Default
        ``False``.
    output_format : {'Magnitude', 'Complex', 'Phase'}
        Default output type; overridable per call with
        ``normalization_type`` in {'librosa', 'convolutional', 'wrap'}.
        Default ``'Magnitude'``.
    verbose : bool
        Print kernel-construction info. Default ``True``.

    Returns
    -------
    spectrogram : jax.Array
        ``(num_audio, n_bins, time_steps)`` Magnitude or
        ``(num_audio, n_bins, time_steps, 2)`` Complex/Phase.

    Examples
    --------
    >>> cqt_layer = CQT2010v2(sr=22050, hop_length=512, n_bins=84)
    >>> spec = cqt_layer(x)
    """

    def __init__(
        self,
        sr: float = 22050,
        hop_length: int = 512,
        fmin: float = 32.70,
        fmax: float | None = None,
        n_bins: int = 84,
        filter_scale: float = 1,
        bins_per_octave: int = 12,
        norm: bool = True,
        basis_norm: float = 1,
        window: str = "hann",
        pad_mode: str = "reflect",
        earlydownsample: bool = True,
        trainable: bool = False,
        output_format: str = "Magnitude",
        verbose: bool = True,
    ):
        super().__init__()
        self.norm = norm
        self.pad_mode = pad_mode
        self.n_bins = n_bins
        self.output_format = output_format
        self.trainable = trainable

        Q, sr_eff, n_filters = self._init_pyramid(
            sr, hop_length, fmin, fmax, n_bins, bins_per_octave, filter_scale,
            earlydownsample, verbose,
        )

        bank = create_cqt_kernels(
            Q, sr_eff, self.fmin_t, n_filters, bins_per_octave,
            norm=basis_norm, topbin_check=False,
        )
        self.n_fft = bank.fft_len

        freqs = fmin * 2.0 ** (np.arange(n_bins) / np.double(bins_per_octave))
        self.frequencies = freqs
        self._register("lenghts", np.ceil(Q * sr_eff / freqs).astype(np.float32))
        self._register("cqt_kernels_real", bank.kernels.real.astype(np.float32),
                       trainable=trainable)
        self._register("cqt_kernels_imag", bank.kernels.imag.astype(np.float32),
                       trainable=trainable)

    def _octave_cqt(self, params, x, hop):
        """Time-domain octave CQT — the reference's ``get_cqt_complex``
        (utils.py:498-521): real = conv(kr), imag = -conv(ki)."""
        x = _center_pad(x, self.n_fft // 2, self.pad_mode)
        real, imag_raw = framed_basis_pair(
            x, params["cqt_kernels_real"], params["cqt_kernels_imag"], hop
        )
        return real, -imag_raw

    def _forward(self, params, x, output_format=None, normalization_type="librosa"):
        output_format = output_format or self.output_format
        _check_norm_type(normalization_type)
        x = broadcast_dim(x)
        if self.earlydownsample:
            x = downsample_by_n(
                x, params["early_downsample_filter"], int(self.downsample_factor)
            )
        levels, hops = self._pyramid_chain(params, x)
        fused = self._fused_pyramid(
            levels, hops, params["cqt_kernels_real"], params["cqt_kernels_imag"]
        )
        if fused is not None:
            # negated at the conv, like the reference (utils.py:518-519)
            real, imag = fused[0], -fused[1]
        else:
            real, imag = self._octave_cqt(params, levels[0], hops[0])
            for lv, h in zip(levels[1:], hops[1:]):
                r1, i1 = self._octave_cqt(params, lv, h)
                real = jnp.concatenate((r1, real), axis=1)
                imag = jnp.concatenate((i1, imag), axis=1)

        real, imag = real[:, -self.n_bins :], imag[:, -self.n_bins :]
        real = real * self.downsample_factor
        imag = imag * self.downsample_factor

        if normalization_type == "librosa":
            scale = jnp.sqrt(params["lenghts"])[None, :, None]
            real, imag = real * scale, imag * scale
        elif normalization_type == "wrap":
            real, imag = real * 2, imag * 2

        return _cqt_output(real, imag, output_format, trainable=self.trainable)

    def __call__(self, x, output_format=None, normalization_type="librosa"):
        return self.apply(
            None, x, output_format=output_format or self.output_format,
            normalization_type=normalization_type,
        )

    def _inverse_atoms(self):
        # every octave reuses the shared top-octave time-domain bank; the
        # per-octave conv negates the imag (utils.py:518-519), so the atom
        # is Kr − i·Ki — the same convention as CQT1992v2
        kr = np.asarray(self._params["cqt_kernels_real"], np.float64)
        ki = np.asarray(self._params["cqt_kernels_imag"], np.float64)
        return ([kr - 1j * ki] * self.n_octaves,
                [self.n_fft // 2] * self.n_octaves)

    def extra_repr(self) -> str:
        return "CQT kernel size = {}, octaves = {}, trainable = {}".format(
            tuple(self._params["cqt_kernels_real"].shape),
            self.n_octaves,
            self.trainable,
        )
