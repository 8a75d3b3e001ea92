"""STFT and inverse STFT transforms.

TPU-native rebuild of the reference STFT family
(``/root/reference/Installation/nnAudio/features/stft.py``): the forward is an
explicit windowed-DFT basis matmul over framed audio (MXU) instead of strided
conv1d; the inverse is an IDFT basis matmul + scatter-add overlap-add with
in-graph window-sumsquare normalization (no stateful ``w_sum`` cache — the
reference's cache at stft.py:42-48 is a cross-call mutation footgun that a
functional design eliminates).

API-visible conventions preserved (SURVEY.md §7 "quirks"):
- ``Complex`` output stacks ``(real, -imag)`` (stft.py:309-311).
- ``Phase`` is scalar ``atan2(-imag + 0.0, real)`` (stft.py:313-316).
- ``Magnitude`` adds 1e-8 under the sqrt only when trainable (stft.py:299-306).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..filters.fourier import create_fourier_basis
from ..filters.windows import pad_center, window_dispatch
from ..core.frame import broadcast_dim, pad_signal
from ..core.apply import phase_atan
from ..core.overlap import (
    extend_fbins,
    normalize_by_window_envelope,
    window_sumsquare,
)
from ..ops.dispatch import (
    framed_basis_pair,
    framed_complex,
    framed_magnitude,
    framed_power,
    synthesis_ola,
)
from .base import SpectralTransform


def hermitian_weights(n_fft: int, n_bins: int, dtype=jnp.float32) -> jax.Array:
    """Per-bin fold weights for onesided synthesis: DC (and Nyquist when
    ``n_fft`` is even) count once, interior bins twice — the mirrored upper
    half of the spectrum contributes exactly the lower half's term, so
    doubling replaces the explicit ``extend_fbins`` mirror and halves the
    IDFT matmul."""
    wt = jnp.full((n_bins,), 2.0, dtype=dtype)
    wt = wt.at[0].set(1.0)
    if n_fft % 2 == 0:
        wt = wt.at[-1].set(1.0)
    return wt


def _inverse_stft_graph(
    X,
    kernel_cos,
    kernel_sin,
    window_mask,
    n_fft: int,
    hop: int,
    onesided: bool,
    length: int | None,
    center: bool,
    pad_amount: int,
    fold_onesided: bool = True,
):
    """Shared iSTFT math (reference ``STFTBase.inverse_stft``, stft.py:15-63).

    ``X``: (B, F, T, 2) complex stack; kernels: (n_fft, n_fft) IDFT bases with
    frequency as the leading axis (rows [:n_fft//2+1] are the onesided bins).
    With frozen kernels the onesided path folds Hermitian symmetry into bin
    weights instead of mirroring the spectrum (``fold_onesided=False`` keeps
    the reference's explicit mirror — required when the full kernel bank is
    trainable so upper-half rows receive gradients, stft.py:439-524).
    """
    if onesided and fold_onesided and X.shape[1] == n_fft // 2 + 1:
        wt = hermitian_weights(n_fft, X.shape[1], X.dtype)
        kc = kernel_cos[: X.shape[1]] * wt[:, None]
        ks = kernel_sin[: X.shape[1]] * wt[:, None]
    else:
        if onesided:
            X = extend_fbins(X)
        kc, ks = kernel_cos, kernel_sin
    # window and 1/n_fft are per-output-sample scales: fold them into the
    # kernel columns so synthesis+overlap-add runs as one fused op
    kc = kc * window_mask[None, :] / n_fft
    ks = ks * window_mask[None, :] / n_fft
    signal = synthesis_ola(X[..., 0], X[..., 1], kc, ks, hop)
    w_sum = window_sumsquare(window_mask, X.shape[2], hop, n_fft)
    signal = normalize_by_window_envelope(signal, w_sum)
    if length is None:
        if center:
            signal = signal[:, pad_amount:-pad_amount]
    else:
        if center:
            signal = signal[:, pad_amount : pad_amount + length]
        else:
            signal = signal[:, :length]
        if signal.shape[1] < length:
            # librosa istft(length=...) semantics: pad a shortfall with
            # zeros so the caller always receives exactly `length` samples
            # (reachable when hop > n_fft//2 trims more than the frames
            # cover, e.g. TimeStretch at large rates with hop == n_fft)
            signal = jnp.pad(
                signal, ((0, 0), (0, length - signal.shape[1])))
    return signal


class STFT(SpectralTransform):
    """Short-time Fourier transform as a (trainable) basis matmul.

    Computes the STFT of an input signal. Accepted input shapes:
    ``(len_audio,)``, ``(num_audio, len_audio)``, or
    ``(num_audio, 1, len_audio)`` — the correct shape is inferred
    automatically. Most arguments follow the librosa convention (reference
    class: stft.py:153-254). On TPU the hot path runs as a fused Pallas
    frame+matmul kernel (magnitude epilogue fused in VMEM); trainable
    kernels differentiate through a custom VJP identical to the XLA path.

    Parameters
    ----------
    n_fft : int
        Size of the Fourier transform. Default 2048.
    win_length : int or None
        Size of the window frame (and of the STFT filters before centered
        zero-padding to ``n_fft``). Default ``None`` — treated as ``n_fft``.
    freq_bins : int or None
        Number of frequency bins. Default ``None`` — ``n_fft//2 + 1`` bins
        (onesided spectrum).
    hop_length : int or None
        Hop (stride) between frames in samples. Default ``None`` —
        ``win_length//4``.
    window : str
        Window function name, dispatched through
        ``scipy.signal.get_window`` (e.g. ``'hann'``, ``'hamming'``,
        ``('gaussian', 50)`` works via scipy too). Default ``'hann'``.
    freq_scale : {'no', 'linear', 'log', 'log2'}
        Spacing of the frequency bins. With ``'linear'``, ``'log'`` or
        ``'log2'`` the bin placement is controlled by ``fmin``/``fmax``;
        with ``'no'`` bins run from 0 Hz to Nyquist with linear spacing and
        ``fmin``/``fmax`` do nothing. Default ``'no'``.
    center : bool
        If ``True`` (default) each frame is centered on its time index
        (the signal is padded by ``n_fft//2`` on both sides); if ``False``
        the time index is the frame start.
    pad_mode : {'reflect', 'constant'}
        Padding method used when ``center=True``. Default ``'reflect'``.
    iSTFT : bool
        If ``True``, also build the inverse kernels so :meth:`inverse` is
        available. Default ``False`` (saves memory). The inverse kernels are
        not trainable — use the standalone :class:`iSTFT` for that.
    fmin, fmax : float
        Frequency range of the lowest/highest bin for the scaled
        ``freq_scale`` modes. Defaults 50 / 6000. Ignored when
        ``freq_scale='no'``.
    sr : float
        Sampling rate of the input audio — used (with ``fmin``/``fmax``) to
        place scaled bins correctly. Default 22050.
    trainable : bool
        If ``True``, the windowed Fourier kernels become leaf parameters:
        gradients flow to them through ``jax.grad`` via
        :meth:`SpectralTransform.apply`. Default ``False``.
    output_format : {'Complex', 'Magnitude', 'Phase'}
        Default output type; can be overridden per call. Default
        ``'Complex'``.
    verbose : bool
        Print kernel-construction info. Default ``True``.

    Returns
    -------
    spectrogram : jax.Array
        ``(num_audio, freq_bins, time_steps)`` for ``'Magnitude'`` /
        ``'Phase'``; ``(num_audio, freq_bins, time_steps, 2)`` for
        ``'Complex'`` (last axis stacks ``(real, -imag)``, matching the
        reference's torch convention, stft.py:309-311). In trainable mode
        Magnitude adds 1e-8 under the sqrt (stft.py:299-306).

    Examples
    --------
    >>> spec_layer = STFT(n_fft=2048, hop_length=512)
    >>> specs = spec_layer(x)                       # (B, 1025, T, 2)
    >>> mags = spec_layer(x, output_format="Magnitude")
    """

    _salt_fields = ('matmul_precision', 'use_pallas', 'use_pallas_analysis')

    def __init__(
        self,
        n_fft: int = 2048,
        win_length: int | None = None,
        freq_bins: int | None = None,
        hop_length: int | None = None,
        window: str = "hann",
        freq_scale: str = "no",
        center: bool = True,
        pad_mode: str = "reflect",
        iSTFT: bool = False,
        fmin: float = 50,
        fmax: float = 6000,
        sr: float = 22050,
        trainable: bool = False,
        output_format: str = "Complex",
        verbose: bool = True,
    ):
        super().__init__()
        if win_length is None:
            win_length = n_fft
        if hop_length is None:
            hop_length = int(win_length // 4)

        self.n_fft = n_fft
        self.win_length = win_length
        self.freq_bins = freq_bins
        self.stride = hop_length
        self.center = center
        self.pad_mode = pad_mode
        self.pad_amount = n_fft // 2
        self.trainable = trainable
        self.output_format = output_format
        self.iSTFT = iSTFT

        basis = create_fourier_basis(
            n_fft,
            win_length=win_length,
            freq_bins=freq_bins,
            window=window,
            freq_scale=freq_scale,
            fmin=fmin,
            fmax=fmax,
            sr=sr,
        )
        self.bins2freq = basis.bins2freq
        self.bin_list = basis.binslist

        window_mask = basis.window_mask  # (n_fft,)
        self._register("wsin", basis.wsin * window_mask[None, :], trainable=trainable)
        self._register("wcos", basis.wcos * window_mask[None, :], trainable=trainable)
        self._register("window_mask", window_mask)

        if iSTFT:
            # full-bin IDFT bases by mirroring (stft.py:218-219); rows k and
            # n_fft-k carry cos/−sin symmetry so the concatenated bank is the
            # dense (n_fft, n_fft) DFT matrix
            ksin, kcos = basis.wsin, basis.wcos
            kernel_sin_inv = np.concatenate((ksin, -ksin[1:-1][::-1]), axis=0)
            kernel_cos_inv = np.concatenate((kcos, kcos[1:-1][::-1]), axis=0)
            self._register("kernel_sin_inv", kernel_sin_inv)
            self._register("kernel_cos_inv", kernel_cos_inv)

        self._verbose_print(verbose, f"STFT basis created: n_fft={n_fft}, freq_bins={basis.wsin.shape[0]}")

    # ------------------------------------------------------------ forward --
    def _forward(self, params, x, output_format="Complex"):
        x = broadcast_dim(x)
        if self.center:
            x = pad_signal(x, self.pad_amount, self.pad_mode)
        if output_format == "Magnitude":
            # fused frame+matmul+magnitude: real/imag never hit HBM. (The
            # basis is built with exactly freq_bins rows, so the reference's
            # post-conv truncation at stft.py:296-297 is a no-op here.)
            return framed_magnitude(
                x, params["wcos"], params["wsin"], self.stride,
                eps=1e-8 if self.trainable else 0.0,
            )
        if output_format == "Complex":
            # fused stacked-Complex: the (real, -imag) convention
            # (stft.py:307-311) is emitted straight from the kernel — no
            # separate stack/negate passes. (The basis has exactly freq_bins
            # rows, so the reference's post-conv truncation is a no-op.)
            return framed_complex(
                x, params["wcos"], params["wsin"], None, self.stride
            )
        spec_real, spec_imag = framed_basis_pair(
            x, params["wcos"], params["wsin"], self.stride
        )
        if self.freq_bins is not None:
            spec_real = spec_real[:, : self.freq_bins]
            spec_imag = spec_imag[:, : self.freq_bins]
        if output_format == "Phase":
            return phase_atan(spec_real, -spec_imag)
        raise ValueError(f"unknown output_format {output_format!r}")

    def _power_spectrogram(self, params, x, power: float):
        """|STFT|^power for the filterbank composites (Mel/Gammatone/Chroma).

        ``power == 2.0`` (their default) uses the fused power-spectrum kernel
        — no sqrt-then-square round trip. Trainable bases keep the magnitude
        path so the reference's 1e-8-under-the-sqrt epsilon survives the
        exponent (mel.py:186)."""
        x = broadcast_dim(x)
        if self.center:
            x = pad_signal(x, self.pad_amount, self.pad_mode)
        if power == 2.0 and not self.trainable:
            return framed_power(x, params["wcos"], params["wsin"], self.stride)
        mag = framed_magnitude(
            x, params["wcos"], params["wsin"], self.stride,
            eps=1e-8 if self.trainable else 0.0,
        )
        if power == 1.0:
            return mag
        return mag ** power

    def _filterbank_spectrogram(self, params, x, basis, power: float,
                                eps: float):
        """Shared composite forward for Mel/Gammatone/Chroma: at the default
        ``power=2`` the whole chain — frame + DFT pair + power + filterbank
        projection — runs as ONE fused kernel
        (ops/dispatch.framed_filterbank; the (B, F, T) spectrogram never
        exists in HBM). Other powers take ``|STFT|^p`` then project. For a
        trainable STFT pass ``eps=1e-8`` (the reference's under-the-sqrt
        epsilon, an additive power offset at p=2)."""
        from ..core.apply import project
        from ..ops.dispatch import framed_filterbank

        if power == 2.0:
            xs = x
            if self.center:
                xs = pad_signal(x, self.pad_amount, self.pad_mode)
            return framed_filterbank(xs, params["wcos"], params["wsin"],
                                     basis, self.stride, eps=eps)
        return project(basis, self._power_spectrogram(params, x, power))

    def __call__(self, x, output_format=None):
        return self.apply(None, x, output_format=output_format or self.output_format)

    def apply(self, params, x, output_format=None, **kw):
        return super().apply(
            params, x, output_format=output_format or self.output_format, **kw
        )

    # ------------------------------------------------------------ inverse --
    def _inverse(self, params, X, onesided=True, length=None, refresh_win=True):
        return _inverse_stft_graph(
            X,
            params["kernel_cos_inv"],
            params["kernel_sin_inv"],
            params["window_mask"],
            self.n_fft,
            self.stride,
            onesided,
            length,
            self.center,
            self.pad_amount,
        )

    def inverse(self, X, onesided=True, length=None, refresh_win=True):
        """Spectrogram -> waveform, using the frozen mirrored kernels.

        ``refresh_win`` is accepted for API parity but has no effect: the
        window envelope is recomputed inside the compiled graph.
        """
        if "kernel_cos_inv" not in self._params:
            raise NameError(
                "Please activate the iSTFT module by setting `iSTFT=True` "
                "if you want to use `inverse`"
            )
        X = jnp.asarray(X)
        if X.ndim != 4:
            raise AssertionError(
                "Inverse iSTFT only works for complex numbers; expected shape "
                "(batch, freq_bins, timesteps, 2). For magnitude spectrograms "
                "use Griffin-Lim."
            )
        import functools

        from ..config import cache_salt

        # the inverse graph additionally reads the synthesis-kernel switch
        key = ("inverse", onesided, length,
               cache_salt(self._salt_fields + ("use_pallas_synthesis",)))
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(self._inverse, onesided=onesided, length=length)
            )
            self._jit_cache[key] = fn
        return fn(dict(self._params), X)

    def extra_repr(self) -> str:
        return "n_fft={}, Fourier Kernel size={}, iSTFT={}, trainable={}".format(
            self.n_fft, tuple(self._params["wsin"].shape), self.iSTFT, self.trainable
        )


class iSTFT(SpectralTransform):
    """Standalone inverse STFT with separately trainable kernels and window.

    Reconstructs a waveform from a complex spectrogram via an IDFT basis
    matmul + overlap-add with in-graph window-sumsquare normalization
    (reference class: stft.py:439-546; unlike the reference there is no
    stateful cross-call ``w_sum`` cache). With onesided frozen kernels the
    Hermitian symmetry is folded into per-bin weights, halving the
    synthesis matmul; on TPU synthesis+OLA can run as one fused kernel.

    Parameters
    ----------
    n_fft : int
        Size of the Fourier transform the spectrogram was produced with.
        Default 2048.
    win_length : int or None
        Analysis window length. Default ``None`` — ``n_fft``. The window
        mask is zero-padded (centered) to ``n_fft``; for
        ``win_length < n_fft`` the reference crashes on a shape mismatch —
        this implementation handles it (documented divergence, ROADMAP.md).
    freq_bins : int or None
        Number of frequency bins of the input spectrogram. Default ``None``
        — ``n_fft//2 + 1`` (use ``onesided=True`` in the call).
    hop_length : int or None
        Hop size used by the forward STFT. Default ``None`` —
        ``win_length//4``.
    window : str
        Window function name (``scipy.signal.get_window``). Default
        ``'hann'``.
    freq_scale, fmin, fmax, sr
        Kernel bin placement, as in :class:`STFT`. Non-``'no'`` scales
        build the matching inverse kernels.
    center : bool
        Whether the forward transform was centered; trims the
        ``n_fft//2``-sample pad from the output. Default ``True``.
    trainable_kernels : bool
        Make the IDFT cos/sin kernel banks leaf parameters. Default
        ``False``.
    trainable_window : bool
        Make the synthesis window mask a leaf parameter. Default ``False``.
    verbose : bool
        Print kernel-construction info. Default ``True``.
    refresh_win : bool
        Accepted for API parity with the reference's window-sumsquare cache
        control; this implementation recomputes the envelope in-graph, so
        the flag has no effect.

    Returns
    -------
    waveform : jax.Array
        ``(num_audio, length)`` reconstruction. Call as
        ``layer(X, onesided=True, length=L)`` where ``X`` is a
        ``(B, F, T, 2)`` complex stack.

    Examples
    --------
    >>> st = STFT(n_fft=1024, hop_length=256, output_format="Complex")
    >>> X = st(x)
    >>> rec = iSTFT(n_fft=1024, hop_length=256)(X, onesided=True,
    ...                                         length=x.shape[-1])
    """

    _salt_fields = ('matmul_precision', 'use_pallas', 'use_pallas_synthesis')

    def __init__(
        self,
        n_fft: int = 2048,
        win_length: int | None = None,
        freq_bins: int | None = None,
        hop_length: int | None = None,
        window: str = "hann",
        freq_scale: str = "no",
        center: bool = True,
        fmin: float = 50,
        fmax: float = 6000,
        sr: float = 22050,
        trainable_kernels: bool = False,
        trainable_window: bool = False,
        verbose: bool = True,
        refresh_win: bool = True,
    ):
        super().__init__()
        if win_length is None:
            win_length = n_fft
        if hop_length is None:
            hop_length = int(win_length // 4)

        self.n_fft = n_fft
        self.win_length = win_length
        self.stride = hop_length
        self.center = center
        self.pad_amount = n_fft // 2
        self.refresh_win = refresh_win

        # full-resolution (n_fft-bin) unwindowed Fourier kernels
        basis = create_fourier_basis(
            n_fft,
            win_length=win_length,
            freq_bins=n_fft,
            window=window,
            freq_scale=freq_scale,
            fmin=fmin,
            fmax=fmax,
            sr=sr,
        )
        window_mask = pad_center(
            window_dispatch(window, int(win_length), fftbins=True), n_fft
        ).astype(np.float32)

        self._register("kernel_sin", basis.wsin, trainable=trainable_kernels)
        self._register("kernel_cos", basis.wcos, trainable=trainable_kernels)
        self._register("window_mask", window_mask, trainable=trainable_window)
        self.trainable_kernels = trainable_kernels
        self._verbose_print(verbose, f"iSTFT kernels created: n_fft={n_fft}")

    def _forward(self, params, X, onesided=False, length=None):
        return _inverse_stft_graph(
            X,
            params["kernel_cos"],
            params["kernel_sin"],
            params["window_mask"],
            self.n_fft,
            self.stride,
            onesided,
            length,
            self.center,
            self.pad_amount,
            # trainable full banks must keep the explicit mirror so the
            # upper-half kernel rows receive gradients
            fold_onesided=not self.trainable_kernels,
        )

    def __call__(self, X, onesided=False, length=None, refresh_win=None):
        return self.apply(None, X, onesided=onesided, length=length)

    def apply(self, params, X, onesided=False, length=None, refresh_win=None):
        X = jnp.asarray(X)
        if X.ndim != 4:
            raise AssertionError(
                "Inverse iSTFT only works for complex numbers; expected shape "
                "(batch, freq_bins, timesteps, 2)."
            )
        return super().apply(params, X, onesided=onesided, length=length)
