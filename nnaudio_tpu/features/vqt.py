"""Variable-Q transform: the 2010v2 pyramid with gamma-widened low bins.

TPU-native rebuild of ``/root/reference/Installation/nnAudio/features/vqt.py``:
``gamma > 0`` lengthens low-frequency windows
(``lengths = ceil(Q*fs/(freqs + gamma/alpha))``, utils.py:444), so unlike
CQT2010v2 each octave gets its **own kernel bank** built at that octave's
rate (vqt.py:121-140). ``VQT(gamma=0)`` is numerically identical to
``CQT2010v2`` (test_vqt.py:29-41), a property our tests enforce.

Faithfully replicated reference quirks:
- per-octave kernels are built from the **original** ``sr`` (``my_sr =
  self.sr``, vqt.py:120) even when early downsampling rescaled the signal —
  whereas the normalization ``lenghts`` use the downsampled rate
  (vqt.py:110); with default parameters early downsampling is inactive so
  the two agree.
- the ``trainable`` flag only toggles the magnitude epsilon; kernels are
  always frozen buffers (vqt.py:136-140).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.frame import broadcast_dim
from ..core.resample import downsample_by_n
from ..filters.cqt import create_cqt_kernels
from ..ops.dispatch import framed_basis_pair
from ..ops.pyramid import pyramid_basis_pair, pyramid_enabled
from .cqt import _PyramidCQT, _center_pad, _check_norm_type, _cqt_output


class VQT(_PyramidCQT):
    """Variable-Q transform: the CQT2010v2 pyramid with a per-octave kernel
    bank whose bandwidths are broadened by ``gamma`` (reference ``vqt.py``).
    At ``gamma=0`` the output is bit-identical to
    :class:`~nnaudio_tpu.features.CQT2010v2` (tested); ``gamma > 0``
    shortens the low-frequency wavelets, trading frequency resolution for
    time resolution like ``librosa.vqt``.

    Parameters
    ----------
    sr : float
        Sampling rate. Default 22050.
    hop_length : int
        Hop at the original rate; halves per octave. Default 512.
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
    gamma : float
        Bandwidth offset in Hz added to each filter's Q bandwidth
        (``alpha * f_k + gamma``). 0 reproduces the CQT exactly. Default 0.
    window : str
        Wavelet window. Default ``'hann'``.
    pad_mode : {'reflect', 'constant'}
        Per-octave padding mode. Default ``'reflect'``.
    earlydownsample : bool
        Pre-decimate the input when possible. Replicates the reference's
        original-sr quirk in the per-octave kernel construction. Default
        ``True``.
    trainable : bool
        Reference-parity quirk (vqt.py:136-140, 203-206): the per-octave
        banks are registered as frozen buffers regardless, and this flag
        only switches the Magnitude output to the ``sqrt(x + 1e-8)`` form
        used for gradient stability. Default ``False``.
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
    >>> vqt_layer = VQT(sr=22050, gamma=2)
    >>> spec = vqt_layer(x)
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
        gamma: float = 0,
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
        self.trainable = trainable
        self.output_format = output_format
        self.sr = sr
        self.gamma = gamma

        # shared 2010-family pyramid calculus (octave count, top-band
        # placement, Nyquist check, early-downsample wiring, lowpass FIR) —
        # _init_pyramid sets self.{n_octaves, fmin_t, hop_length,
        # earlydownsample, downsample_factor} and returns the effective
        # (post-downsample) sample rate the normalization lengths use
        Q, sr_eff, n_filters = self._init_pyramid(
            sr, hop_length, fmin, fmax, n_bins, bins_per_octave,
            filter_scale, earlydownsample, verbose,
        )

        alpha = 2.0 ** (1.0 / bins_per_octave) - 1.0
        freqs = fmin * 2.0 ** (np.arange(n_bins) / np.double(bins_per_octave))
        self.frequencies = freqs
        lengths = np.ceil(Q * sr_eff / (freqs + gamma / alpha))
        self._register("lenghts", lengths.astype(np.float32))

        # one kernel bank per octave at successively halved rates; note the
        # reference seeds this from the ORIGINAL sr (vqt.py:120)
        self._octave_widths: list[int] = []
        my_sr = float(self.sr)
        for i in range(self.n_octaves):
            if i > 0:
                my_sr /= 2
            bank = create_cqt_kernels(
                Q,
                my_sr,
                self.fmin_t * 2 ** -i,
                n_filters,
                bins_per_octave,
                norm=basis_norm,
                topbin_check=False,
                gamma=gamma,
            )
            self._octave_widths.append(bank.fft_len)
            self._register(f"cqt_kernels_real_{i}", bank.kernels.real.astype(np.float32))
            self._register(f"cqt_kernels_imag_{i}", bank.kernels.imag.astype(np.float32))

    def _forward(self, params, x, output_format=None, normalization_type="librosa"):
        output_format = output_format or self.output_format
        _check_norm_type(normalization_type)
        x = broadcast_dim(x)
        if self.earlydownsample:
            x = downsample_by_n(
                x, params["early_downsample_filter"], int(self.downsample_factor)
            )
        # serial-or-parallel decimation chain shared with the CQT2010
        # family (use_parallel_chain), then per-octave center padding at
        # each octave's own kernel width
        raw_levels, hops = self._pyramid_chain(params, x)
        levels = [
            _center_pad(lv, self._octave_widths[i] // 2, self.pad_mode)
            for i, lv in enumerate(raw_levels)
        ]

        fused = None
        if pyramid_enabled():
            # deepest octave first: the reference assembles bins via
            # insert(0, ...) (vqt.py:85-117)
            fused = pyramid_basis_pair(
                levels[::-1],
                [params[f"cqt_kernels_real_{i}"]
                 for i in reversed(range(self.n_octaves))],
                [params[f"cqt_kernels_imag_{i}"]
                 for i in reversed(range(self.n_octaves))],
                hops[::-1],
            )
        if fused is not None:
            real, imag_raw = fused
            real = real[:, -self.n_bins :]
            imag = -imag_raw[:, -self.n_bins :]
        else:
            reals, imags = [], []
            for i in range(self.n_octaves):
                r, im_raw = framed_basis_pair(
                    levels[i], params[f"cqt_kernels_real_{i}"],
                    params[f"cqt_kernels_imag_{i}"], hops[i]
                )
                reals.insert(0, r)
                imags.insert(0, -im_raw)
            real = jnp.concatenate(reals, axis=1)[:, -self.n_bins :]
            imag = jnp.concatenate(imags, axis=1)[:, -self.n_bins :]
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
        # per-octave banks (γ widens deep-octave bandwidths, so each level
        # has its own kernels and width); imag negated at the conv, so the
        # atom is Kr − i·Ki per level
        import numpy as np

        atoms = []
        for i in range(self.n_octaves):
            kr = np.asarray(self._params[f"cqt_kernels_real_{i}"], np.float64)
            ki = np.asarray(self._params[f"cqt_kernels_imag_{i}"], np.float64)
            atoms.append(kr - 1j * ki)
        return atoms, [w // 2 for w in self._octave_widths]

    def extra_repr(self) -> str:
        return "VQT octaves = {}, gamma = {}, widths = {}".format(
            self.n_octaves, self.gamma, self._octave_widths
        )
