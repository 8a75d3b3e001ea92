"""Feature/transform API — the product surface.

Mirrors the reference namespace (``features/__init__.py:6-14`` star-exports
every feature module): all transforms are importable both from here and from
the deprecated ``nnaudio_tpu.Spectrogram`` shim.
"""
from .base import SpectralTransform
# the reference exposes its nn.Module base as STFTBase (stft.py:15) — alias
# kept so isinstance checks / subclass imports port
STFTBase = SpectralTransform
from .stft import STFT, iSTFT
from .mel import MelSpectrogram, MFCC
from .gammatone import Gammatonegram
from .chroma import ChromaSTFT
from .cqt import CQT, CQT1992, CQT1992v2, CQT2010, CQT2010v2
from .vqt import VQT
from .cfp import CFP, Combined_Frequency_Periodicity
from .griffin_lim import Griffin_Lim
from .inverse_cqt import GriffinLimCQT
from .inverse_mel import InverseMelSpectrogram, InverseMFCC
from .time_stretch import PitchShift, TimeStretch, phase_vocoder, resample
# function-level reference API (the reference star-exports its kernel
# generators through this namespace, features/__init__.py:6-14)
from ..compat import *  # noqa: F401,F403
from ..compat import __all__ as _compat_all

__all__ = [
    "SpectralTransform",
    "STFTBase",
    "STFT",
    "iSTFT",
    "MelSpectrogram",
    "MFCC",
    "Gammatonegram",
    "ChromaSTFT",
    "CQT",
    "CQT1992",
    "CQT1992v2",
    "CQT2010",
    "CQT2010v2",
    "VQT",
    "CFP",
    "Combined_Frequency_Periodicity",
    "Griffin_Lim",
    "GriffinLimCQT",
    "InverseMelSpectrogram",
    "InverseMFCC",
    "PitchShift",
    "TimeStretch",
    "resample",
    "phase_vocoder",
] + list(_compat_all)
