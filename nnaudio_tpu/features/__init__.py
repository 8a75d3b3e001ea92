"""Feature/transform API — the product surface (reference parity: features/)."""
from .stft import STFT, iSTFT

__all__ = ["STFT", "iSTFT"]
