"""Trainable-frontend audio classifier (flagship end-to-end model)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..features.mel import MelSpectrogram


class SpectrogramClassifier:
    """MelSpectrogram (trainable STFT + mel bases) → log → temporal mean-pool
    → linear head. All state lives in one params pytree; ``loss_fn`` and
    :func:`train_step` differentiate end-to-end through the DSP frontend."""

    def __init__(
        self,
        n_classes: int = 10,
        sr: float = 16000,
        n_fft: int = 1024,
        hop_length: int = 256,
        n_mels: int = 64,
        seed: int = 0,
    ):
        self.frontend = MelSpectrogram(
            sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels,
            trainable_mel=True, trainable_STFT=True, verbose=False,
        )
        rng = np.random.RandomState(seed)
        head_w = (rng.randn(n_mels, n_classes) / np.sqrt(n_mels)).astype(np.float32)
        self.init_params = {
            **self.frontend.params,
            "head_w": jnp.asarray(head_w),
            "head_b": jnp.zeros((n_classes,), jnp.float32),
        }

    def forward(self, params, x):
        """(B, L) waveforms -> (B, n_classes) logits."""
        mel = self.frontend._forward(params, x)  # (B, M, T)
        # clamp before the log: once the mel basis trains, projections can go
        # negative and an unguarded log NaNs the whole optimization
        feats = jnp.mean(jnp.log(jnp.maximum(mel, 0.0) + 1e-6), axis=-1)
        return feats @ params["head_w"] + params["head_b"]

    def loss_fn(self, params, x, labels):
        logits = self.forward(params, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def train_step(model: SpectrogramClassifier, params, x, labels, lr=1e-3):
    """One SGD step; jit/shard_map-clean (pure function of the pytree)."""
    loss, grads = jax.value_and_grad(model.loss_fn)(params, x, labels)
    new_params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    return loss, new_params
