"""nnaudio_tpu — TPU-native trainable spectral feature framework.

A from-scratch JAX/XLA/Pallas rebuild of the nnAudio capability surface
(reference: KinWaiCheuk/nnAudio @ /root/reference). Transforms are precomputed
Fourier/wavelet/filterbank bases applied to framed audio as MXU matmuls, with
trainable bases under ``jax.grad``, fused Pallas hot paths, and multi-chip
scale-out via ``jax.sharding`` (see ``nnaudio_tpu.parallel``).
"""

__version__ = "0.4.0"

from . import config
from .config import (fast_mode, set_matmul_precision, set_use_fused_pyramid,
                     set_use_mxu_fft, set_use_pallas, set_use_pallas_analysis,
                     set_use_pallas_synthesis, set_use_parallel_chain)

__all__ = ["config", "fast_mode", "set_matmul_precision", "set_use_pallas",
           "set_use_pallas_analysis",
           "set_use_pallas_synthesis", "set_use_fused_pyramid",
           "set_use_mxu_fft", "set_use_parallel_chain", "features",
           "streaming"]


def __getattr__(name):
    # lazy import so `import nnaudio_tpu` stays light
    if name in ("features", "filters", "core", "ops", "parallel",
                "utils", "streaming", "Spectrogram"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
