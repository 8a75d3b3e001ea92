"""Example models built on the trainable spectral frontend.

The reference's headline trainability demo is "train the STFT basis inside a
model" (Sphinx intro.rst:162-184); :class:`SpectrogramClassifier` is that
pattern as a pytree-parameterized model: trainable Mel/STFT frontend → log
compression → mean-pool → linear head, with a jit/grad-clean ``train_step``.
"""
from .classifier import SpectrogramClassifier, train_step

__all__ = ["SpectrogramClassifier", "train_step"]
