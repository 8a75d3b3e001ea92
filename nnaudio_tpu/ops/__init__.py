"""Pallas TPU kernels + backend dispatch for the compute hot path.

Public ops (all custom-VJP, all with XLA fallbacks off-TPU or outside the
kernel envelopes):

- :func:`framed_basis_pair` — two (B, F, T) basis projections (STFT core)
- :func:`framed_complex` — reference-convention ``(B, F, T, 2)`` stack
  ``(real*s, -imag*s)`` (XLA fuses the epilogue for free — measured note
  in framed_matmul.py)
- :func:`framed_magnitude` — fused ``sqrt((xW_c)^2 + (xW_s)^2 + eps)``
- :func:`framed_power` — fused power spectrum (no sqrt)
- :func:`framed_filterbank` — fused ``fb @ (|STFT|^2 + eps)`` (whole Mel)
- :func:`synthesis_ola` — iSTFT synthesis + overlap-add
"""
from .dispatch import (
    framed_basis_pair,
    framed_complex,
    framed_filterbank,
    framed_magnitude,
    framed_power,
    synthesis_ola,
)

__all__ = [
    "framed_basis_pair",
    "framed_complex",
    "framed_filterbank",
    "framed_magnitude",
    "framed_power",
    "synthesis_ola",
]
