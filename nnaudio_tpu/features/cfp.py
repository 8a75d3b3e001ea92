"""Combined Frequency & Periodicity (CFP) multipitch features.

TPU-native rebuild of ``/root/reference/Installation/nnAudio/features/cfp.py``
(Su & Yang's multipitch feature): a long-window STFT magnitude feeds
alternating spectral/cepstral layers — ``relu(x)^g`` nonlinearities with
index-range cutoffs and real-FFT transforms — and the final spectral and
quefrency maps are projected onto a log-frequency axis and multiplied
(``Z = tfrLF * tfrLQ``).

TPU mapping decisions:
- Every vector in the reference's chain is even-symmetric (the STFT
  magnitude is, pointwise nonlinearities preserve it, the cutoff masks are
  symmetric, and ``Re(FFT)`` of a symmetric real vector is symmetric), so
  the whole chain runs in **half-spectrum representation** (``N//2 + 1``
  bins), halving every elementwise/masking pass. Interior transforms
  symmetrize + rfft (measured faster than a dense (half, half) HIGHEST
  matmul: 2.9 vs 3.9 ms full-CFP — the XLA TPU FFT is slow at ~0.14
  TFLOP/s effective, but N/2+1 = 4001 squared MACs at fp32-HIGHEST are
  slower still); the final layer's transform IS a matmul — a folded real-DFT
  basis with Hermitian fold weights (1, 2, ..., 2, 1) truncated to the rows
  the caller keeps (~N/16 of them).
- The cutoff zeroing (cfp.py:182-193) uses a precomputed static mask instead
  of in-place slice assignment; in half space only the leading cutoff
  survives (the trailing ``[-c:]`` region is the mirror of ``[1:c+1]`` and is
  handled by the fold). The reference's ``X[:, :, -0:] = 0`` all-zeroing
  quirk when ``cutoff == 0`` is NOT replicated (documented deviation: a zero
  cutoff masks nothing here; default parameters never produce cutoff 0).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.signal.windows import blackmanharris

from ..config import dot_precision
from ..core.apply import project
from ..ops.mxu_fft import mxu_fft_enabled, rfft_mxu
from ..core.frame import broadcast_dim, frame_signal
from ..filters.cfp import cfp_logfreq_matrices
from ..filters.windows import pad_center
from .base import SpectralTransform

_EPSILON = 1e-8  # reference fudge factor (utils.py:20)


def _folded_dft_basis(n: int, rows: int) -> np.ndarray:
    """(rows, n//2+1) real-DFT basis over a half-spectrum input: for an
    even-symmetric full vector v (v[m] = v[n-m]),
    ``Re(FFT_n(v))[k] == basis @ v[:n//2+1]`` with Hermitian fold weights."""
    half = n // 2 + 1
    kk = np.arange(rows)[:, None]
    mm = np.arange(half)[None, :]
    fold = np.full(half, 2.0)
    fold[0] = 1.0
    if n % 2 == 0:
        fold[-1] = 1.0
    return (np.cos(2 * np.pi * kk * mm / n) * fold[None, :]).astype(np.float32)


class Combined_Frequency_Periodicity(SpectralTransform):
    """Combined frequency & periodicity multipitch feature (Su & Yang): a
    long-window STFT magnitude feeds alternating spectral/cepstral
    ``relu^g`` layers with index cutoffs; the final spectral and quefrency
    maps are projected onto a log-frequency axis and multiplied.

    Parameters
    ----------
    fr : float
        Frequency resolution in Hz; the internal transform length is
        ``N = fs/fr``. Default 2.
    fs : float
        Sampling rate of the input audio. Default 16000.
    hop_length : int
        Hop between frames in samples. Default 320.
    window_size : int
        Blackman-Harris analysis window length (zero-padded to ``N``).
        Default 2049.
    fc : float
        Spectral cutoff in Hz: spectral layers zero bins below
        ``fc/fr``. Default 80.
    tc : float
        Periodicity (quefrency) cutoff in seconds: cepstral layers zero
        quefrencies below ``fs*tc`` samples. Default 1/1000.
    g : sequence of float
        Per-layer nonlinearity exponents (``relu(x)^g``; a 0 entry means
        ``log``). Length sets the number of layers. Default
        ``(0.24, 0.6, 1)``.
    NumPerOct : int
        Log-frequency output resolution, bins per octave. Default 48.

    Returns
    -------
    (Z, tfrL0, tfrLF, tfrLQ) : tuple of jax.Array
        ``Z = tfrLF * tfrLQ`` is the combined map; ``tfrL0/ tfrLF/ tfrLQ``
        are the log-frequency projections of the raw spectrogram, the final
        spectral layer, and the final cepstral layer, each
        ``(num_audio, NumPerOct * n_octaves, time_steps)``. The first and
        last frames are trimmed (cfp.py:152-155).

    Examples
    --------
    >>> layer = Combined_Frequency_Periodicity(fs=16000)
    >>> Z, tfrL0, tfrLF, tfrLQ = layer(x)
    """

    _trim_edge_frames = True

    _salt_fields = ('matmul_precision', 'use_mxu_fft')

    def __init__(
        self,
        fr: float = 2,
        fs: float = 16000,
        hop_length: int = 320,
        window_size: int = 2049,
        fc: float = 80,
        tc: float = 1 / 1000,
        g=(0.24, 0.6, 1),
        NumPerOct: int = 48,
    ):
        super().__init__()
        self.window_size = window_size
        self.hop_length = hop_length

        self.N = int(fs / float(fr))
        self.half = self.N // 2 + 1
        self.f = fs * np.linspace(0, 0.5, self.N // 2, endpoint=True)
        h = blackmanharris(window_size)
        self._register("h", pad_center(h.astype(np.float32), self.N))
        self.h_norm = float(np.linalg.norm(h))

        self.g = list(g)
        self.NumofLayer = len(self.g)
        self.tc_idx = round(fs * tc)
        self.fc_idx = round(fc / fr)
        self.HighFreqIdx = int(round((1 / tc) / fr) + 1)
        self.HighQuefIdx = int(round(fs / fc) + 1)

        self.f = self.f[: self.HighFreqIdx]
        self.q = np.arange(self.HighQuefIdx) / float(fs)

        freq_mat, quef_mat = cfp_logfreq_matrices(
            self.f, self.q, fr, fc, tc, NumPerOct, fs
        )
        self._register("freq2logfreq_matrix", freq_mat.astype(np.float32))
        self._register("quef2logfreq_matrix", quef_mat.astype(np.float32))

        if self.NumofLayer >= 2:
            # the final layer's output is cropped to HighFreqIdx/HighQuefIdx
            # bins right after — truncate its DFT rows to what survives
            final_is_spec = (self.NumofLayer - 1) % 2 == 0
            k = self.HighFreqIdx if final_is_spec else self.HighQuefIdx
            self._register("dft_final",
                           _folded_dft_basis(self.N, min(k, self.half)))

    # ------------------------------------------------------------- helpers --
    def _nonlinear(self, X, g: float, cutoff: int):
        """relu^g (or log) with the reference's cutoff mask expressed in
        half-spectrum space: full bin ``m`` is zeroed when ``m < cutoff`` or
        ``m >= N - cutoff``; the trailing zeros are mirrors of bins
        ``[1:cutoff+1)`` handled by the Hermitian fold, EXCEPT that for
        ``cutoff >= N/2`` the trailing range reaches into the stored half
        (e.g. bin N/2 at cutoff == N/2), so the exact membership test is
        used rather than the leading mask alone."""
        c = int(cutoff)
        m = np.arange(X.shape[-1])
        if c > 0:
            mask = ((m >= c) & (m < self.N - c)).astype(np.float32)
        else:
            mask = np.ones(X.shape[-1], dtype=np.float32)
        mask = jnp.asarray(mask, X.dtype)
        if g != 0:
            return (jnp.maximum(X, 0.0) * mask) ** g * mask
        return jnp.log(jnp.maximum(X, 0.0) + _EPSILON) * mask

    def _cfp_layers(self, spec, params):
        """Alternating cepstral/spectral nonlinear layers (cfp.py:119-135),
        entirely in half-spectrum space: each layer's transform is one folded
        real-DFT basis matmul on the MXU (see module docstring).

        Asymmetry correction: the reference's cutoff mask zeros full bins
        ``[0:c)`` and ``[N-c:N)`` — NOT a symmetric set: bin ``c``'s mirror
        ``N-c`` is zeroed while ``c`` itself survives. The fold counts
        ``v[c]`` twice (once as its own mirror), so each DFT whose input
        carried a cutoff subtracts the one phantom-bin contribution
        ``v[c] * cos(2*pi*k*c/N)`` — this keeps the half-space chain
        bit-equivalent to the reference's full-length recursion."""
        spec = jnp.maximum(spec, 0.0) ** self.g[0]
        ceps = jnp.zeros_like(spec)
        sqrt_n = np.sqrt(self.N)
        prec = dot_precision()

        def phantom(v, out, c):
            """Remove the phantom-mirror contribution of bin ``c`` (see
            docstring above); ``out`` has either ``half`` or truncated rows."""
            if 0 < int(c) < self.half - 1:
                cos_k = np.cos(2 * np.pi * np.arange(out.shape[-1]) * int(c)
                               / self.N).astype(np.float32)
                out = out - v[..., int(c) : int(c) + 1] * cos_k
            return out

        def dft_interior(v, in_cutoff):
            # symmetrize -> rfft -> keep half: the XLA FFT beats a dense
            # (half, half) HIGHEST matmul here (2.9 vs 3.9 ms full-CFP);
            # on TPU the staged MXU rfft replaces the slow XLA FFT lowering
            # (ops/mxu_fft.py)
            if self.N % 2 == 0:
                full = jnp.concatenate((v, v[..., 1:-1][..., ::-1]), -1)
            else:
                full = jnp.concatenate((v, v[..., 1:][..., ::-1]), -1)
            out = None
            if mxu_fft_enabled():
                pair = rfft_mxu(full)
                if pair is not None:
                    out = pair[0]
            if out is None:
                out = jnp.fft.rfft(full, axis=-1).real
            return phantom(v, out, in_cutoff) / sqrt_n

        def dft_final(v, in_cutoff):
            out = jnp.einsum("btn,kn->btk", v, params["dft_final"],
                             precision=prec,
                             preferred_element_type=jnp.float32)
            return phantom(v, out, in_cutoff) / sqrt_n

        in_cutoff = 0  # layer-0 relu^g carries no mask: exactly symmetric
        for gc in range(1, self.NumofLayer):
            dft = (dft_final if gc == self.NumofLayer - 1 else dft_interior)
            if gc % 2 == 1:
                ceps = self._nonlinear(dft(spec, in_cutoff), self.g[gc],
                                       self.tc_idx)
                in_cutoff = self.tc_idx
            else:
                spec = self._nonlinear(dft(ceps, in_cutoff), self.g[gc],
                                       self.fc_idx)
                in_cutoff = self.fc_idx
        return spec, ceps

    def _stft_mag(self, params, x):
        """torch.stft(N, hop, win=blackmanharris(window_size), onesided=False,
        center=True, pad_mode='constant') magnitude, transposed to
        (B, T, N//2+1) half spectrum and normalized by ||h|| (cfp.py:138-150).
        The reference materializes the mirrored full spectrum; the mirror is
        redundant (see module docstring) and never built here."""
        x = jnp.pad(x, ((0, 0), (self.N // 2, self.N // 2)))
        frames = frame_signal(x, self.N, self.hop_length)  # (B, T, N)
        windowed = frames * params["h"][None, None, :]
        if mxu_fft_enabled():
            pair = rfft_mxu(windowed)
            if pair is not None:
                re, im = pair
                return jnp.sqrt(re * re + im * im) / self.h_norm
        X = jnp.fft.rfft(windowed, axis=-1)
        return jnp.abs(X) / self.h_norm  # (B, T, N//2+1)

    # ------------------------------------------------------------- forward --
    def _forward(self, params, x):
        x = broadcast_dim(x)
        tfr0 = self._stft_mag(params, x)  # (B, T, N//2+1)
        if self._trim_edge_frames:
            tfr0 = tfr0[:, 1:-1]
        tfr, ceps = self._cfp_layers(tfr0, params)

        tfr0 = tfr0[:, :, : self.HighFreqIdx]
        tfr = tfr[:, :, : self.HighFreqIdx]
        ceps = ceps[:, :, : self.HighQuefIdx]

        tfrL0 = project(params["freq2logfreq_matrix"], jnp.swapaxes(tfr0, 1, 2))
        tfrLF = project(params["freq2logfreq_matrix"], jnp.swapaxes(tfr, 1, 2))
        tfrLQ = project(params["quef2logfreq_matrix"], jnp.swapaxes(ceps, 1, 2))
        Z = tfrLF * tfrLQ
        return Z, tfrL0, tfrLF, tfrLQ

    def __call__(self, x):
        out = self.apply(None, x)
        # host-side convenience attribute kept for parity (cfp.py:172-177)
        length = np.shape(x)[-1]
        self.t = np.arange(
            self.hop_length,
            np.ceil(length / float(self.hop_length)) * self.hop_length,
            self.hop_length,
        )
        return out


class CFP(Combined_Frequency_Periodicity):
    """Combined Frequency & Periodicity, single-output variant: returns only
    ``Z`` and does not trim edge frames, so time steps align with the other
    transforms in this package (reference cfp.py:249-484). Same parameters
    as :class:`Combined_Frequency_Periodicity`.

    Examples
    --------
    >>> Z = CFP(fs=16000)(x)   # (num_audio, NumPerOct * n_oct, time_steps)
    """

    _trim_edge_frames = False

    def _forward(self, params, x):
        Z, _, _, _ = super()._forward(params, x)
        return Z
