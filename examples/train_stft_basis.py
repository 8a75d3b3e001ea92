"""Train the STFT basis by gradient descent — the reference's headline demo.

Reproduces the experiment behind the reference's `figures/STFT_training.png`
(Sphinx intro.rst:162-184): initialize a trainable STFT, define a target
spectral representation the fixed basis cannot produce, and let SGD reshape
the Fourier kernels. Here the task is denoising: recover the clean tone's
magnitude spectrogram from a noisy waveform; the learned basis suppresses
the noise subspace.

Run: python examples/train_stft_basis.py  (CPU or TPU; ~30 s)
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import features


def make_batch(key, batch=16, sr=8000, dur=0.5):
    t = np.arange(int(sr * dur)) / sr
    ks = jax.random.split(key, 3)
    freqs = jax.random.uniform(ks[0], (batch, 1), minval=200.0, maxval=2000.0)
    clean = jnp.sin(2 * np.pi * freqs * t[None, :])
    noise = 0.5 * jax.random.normal(ks[1], clean.shape)
    return (clean + noise).astype(jnp.float32), clean.astype(jnp.float32)


def main():
    sr, n_fft, hop = 8000, 512, 128
    stft = features.STFT(n_fft=n_fft, hop_length=hop, sr=sr, trainable=True,
                         output_format="Magnitude", verbose=False)
    frozen = features.STFT(n_fft=n_fft, hop_length=hop, sr=sr,
                           output_format="Magnitude", verbose=False)

    params = stft.trainable_params()

    def loss_fn(p, noisy, clean):
        pred = stft._forward({**stft._params, **p}, noisy,
                             output_format="Magnitude")
        target = frozen._forward(frozen._params, clean,
                                 output_format="Magnitude")
        return jnp.mean((pred - target) ** 2)

    @jax.jit
    def step(p, noisy, clean, lr=3e-2):
        loss, grads = jax.value_and_grad(loss_fn)(p, noisy, clean)
        return loss, jax.tree_util.tree_map(lambda a, g: a - lr * g, p, grads)

    key = jax.random.PRNGKey(0)
    for i in range(200):
        key, sub = jax.random.split(key)
        noisy, clean = make_batch(sub, sr=sr)
        loss, params = step(params, noisy, clean)
        if i % 20 == 0:
            print(f"step {i:4d}  loss {float(loss):.5f}")

    # the trained basis now differs from the DFT it started as
    d = jnp.abs(params["wcos"] - stft._params["wcos"]).max()
    print(f"max |Δwcos| after training: {float(d):.4f}")
    stft.update_params(params)  # bake the learned basis back in


if __name__ == "__main__":
    main()
