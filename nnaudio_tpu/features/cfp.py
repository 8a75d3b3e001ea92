"""Combined Frequency & Periodicity (CFP) multipitch features.

TPU-native rebuild of ``/root/reference/Installation/nnAudio/features/cfp.py``
(Su & Yang's multipitch feature): a long-window STFT magnitude feeds
alternating spectral/cepstral layers — ``relu(x)^g`` nonlinearities with
index-range cutoffs and real-FFT transforms — and the final spectral and
quefrency maps are projected onto a log-frequency axis and multiplied
(``Z = tfrLF * tfrLQ``).

TPU mapping decisions:
- The reference's ``torch.stft``/``rfft_fn`` calls (cfp.py:125-147) become
  framed ``jnp.fft.rfft`` transforms: at ``N = fs/fr = 8000`` a dense DFT
  basis matmul would do ~640x the FLOPs of the FFT, so this is the one
  transform family where the FFT beats the MXU matmul.
- ``Re(FFT(v))`` of a real vector is recovered from the rfft by even
  symmetry (``Re X[N-k] = Re X[k]``) — no full complex FFT needed.
- The cutoff zeroing (cfp.py:182-193) uses a precomputed static mask instead
  of in-place slice assignment. The reference's ``X[:, :, -0:] = 0``
  all-zeroing quirk when ``cutoff == 0`` is NOT replicated (documented
  deviation: a zero cutoff masks nothing here; default parameters never
  produce cutoff 0).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from scipy.signal.windows import blackmanharris

from ..config import dot_precision
from ..core.apply import project
from ..core.frame import broadcast_dim, frame_signal
from ..filters.cfp import cfp_logfreq_matrices
from ..filters.windows import pad_center
from .base import SpectralTransform

_EPSILON = 1e-8  # reference fudge factor (utils.py:20)


def _real_fft(v: jnp.ndarray, n: int) -> jnp.ndarray:
    """Real part of the length-``n`` DFT of a real signal along the last axis,
    via rfft + even-symmetry mirroring."""
    half = jnp.fft.rfft(v, axis=-1).real  # (..., n//2 + 1)
    if n % 2 == 0:
        upper = half[..., 1:-1][..., ::-1]
    else:
        upper = half[..., 1:][..., ::-1]
    return jnp.concatenate((half, upper), axis=-1)


class Combined_Frequency_Periodicity(SpectralTransform):
    """Returns ``(Z, tfrL0, tfrLF, tfrLQ)``; the first/last frames are trimmed
    (cfp.py:152-155). Defaults: ``fr=2, fs=16000, hop_length=320,
    window_size=2049, fc=80, tc=1/1000, g=[0.24, 0.6, 1], NumPerOct=48``.
    """

    _trim_edge_frames = True

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

        k = self._final_dft_rows()
        if k:
            # truncated real-DFT basis for the final layer: Re(FFT)[0:k]
            kk = np.arange(k)[:, None]
            nn = np.arange(self.N)[None, :]
            self._register(
                "dft_trunc",
                np.cos(2 * np.pi * kk * nn / self.N).astype(np.float32),
            )

    # ------------------------------------------------------------- helpers --
    def _cutoff_mask(self, cutoff: int, dtype=jnp.float32) -> jnp.ndarray:
        mask = np.ones(self.N, dtype=np.float32)
        c = int(cutoff)
        if c > 0:
            mask[:c] = 0.0
            mask[-c:] = 0.0
        return jnp.asarray(mask, dtype=dtype)

    def _nonlinear(self, X, g: float, cutoff: int):
        mask = self._cutoff_mask(cutoff, X.dtype)
        if g != 0:
            return (jnp.maximum(X, 0.0) * mask) ** g * mask
        return jnp.log(jnp.maximum(X, 0.0) + _EPSILON) * mask

    def _final_dft_rows(self) -> int:
        """Output bins actually consumed from the LAST layer (everything past
        them is cropped in ``_forward``), or 0 when no truncation applies."""
        if self.NumofLayer < 2:
            return 0
        final_is_spec = (self.NumofLayer - 1) % 2 == 0
        k = self.HighFreqIdx if final_is_spec else self.HighQuefIdx
        return k if k < self.N // 2 else 0

    def _nonlinear_trunc(self, X, g: float, cutoff: int):
        """Nonlinearity on a truncated transform: only the leading-cutoff
        mask applies (the trailing-cutoff region was never computed)."""
        mask = np.ones(X.shape[-1], dtype=np.float32)
        if int(cutoff) > 0:
            mask[: int(cutoff)] = 0.0
        mask = jnp.asarray(mask, X.dtype)
        if g != 0:
            return (jnp.maximum(X, 0.0) * mask) ** g * mask
        return jnp.log(jnp.maximum(X, 0.0) + _EPSILON) * mask

    def _cfp_layers(self, spec, dft_trunc=None):
        """Alternating cepstral/spectral nonlinear layers (cfp.py:119-135).

        The final layer's real-DFT is truncated to the bins the caller keeps
        (~N/16 of them) as a basis matmul — the full-length FFT there is
        wasted work."""
        spec = jnp.maximum(spec, 0.0) ** self.g[0]
        ceps = jnp.zeros_like(spec)
        sqrt_n = np.sqrt(self.N)
        prec = dot_precision()
        for gc in range(1, self.NumofLayer):
            last = gc == self.NumofLayer - 1 and dft_trunc is not None
            if gc % 2 == 1:
                if last:
                    ceps = jnp.einsum("btn,kn->btk", spec, dft_trunc,
                                      precision=prec,
                                      preferred_element_type=jnp.float32) / sqrt_n
                    ceps = self._nonlinear_trunc(ceps, self.g[gc], self.tc_idx)
                else:
                    ceps = _real_fft(spec, self.N) / sqrt_n
                    ceps = self._nonlinear(ceps, self.g[gc], self.tc_idx)
            else:
                if last:
                    spec = jnp.einsum("btn,kn->btk", ceps, dft_trunc,
                                      precision=prec,
                                      preferred_element_type=jnp.float32) / sqrt_n
                    spec = self._nonlinear_trunc(spec, self.g[gc], self.fc_idx)
                else:
                    spec = _real_fft(ceps, self.N) / sqrt_n
                    spec = self._nonlinear(spec, self.g[gc], self.fc_idx)
        return spec, ceps

    def _stft_mag(self, params, x):
        """torch.stft(N, hop, win=blackmanharris(window_size), onesided=False,
        center=True, pad_mode='constant') magnitude, transposed to
        (B, T, N) and normalized by ||h|| (cfp.py:138-150)."""
        x = jnp.pad(x, ((0, 0), (self.N // 2, self.N // 2)))
        frames = frame_signal(x, self.N, self.hop_length)  # (B, T, N)
        X = jnp.fft.rfft(frames * params["h"][None, None, :], axis=-1)
        mag_half = jnp.abs(X)  # (B, T, N//2+1)
        if self.N % 2 == 0:
            upper = mag_half[..., 1:-1][..., ::-1]
        else:
            upper = mag_half[..., 1:][..., ::-1]
        mag = jnp.concatenate((mag_half, upper), axis=-1)
        return mag / self.h_norm

    # ------------------------------------------------------------- forward --
    def _forward(self, params, x):
        x = broadcast_dim(x)
        tfr0 = self._stft_mag(params, x)  # (B, T, N)
        if self._trim_edge_frames:
            tfr0 = tfr0[:, 1:-1]
        tfr, ceps = self._cfp_layers(tfr0, params.get("dft_trunc"))

        half = int(round(self.N / 2))
        tfr0 = tfr0[:, :, :half][:, :, : self.HighFreqIdx]
        tfr = tfr[:, :, :half][:, :, : self.HighFreqIdx]
        ceps = ceps[:, :, :half][:, :, : self.HighQuefIdx]

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
    """Variant returning only ``Z`` with no edge-frame trimming, so timesteps
    align with the other transforms (cfp.py:249-484)."""

    _trim_edge_frames = False

    def _forward(self, params, x):
        Z, _, _, _ = super()._forward(params, x)
        return Z
