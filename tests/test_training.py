"""End-to-end learning through the DSP frontend.

Beyond gradient finiteness: the flagship classifier must actually *learn* a
frequency-discrimination task through the trainable Mel+STFT frontend — the
reference's headline capability ("train the STFT basis", intro.rst:162-184)
validated as optimization dynamics, not just autodiff plumbing.
"""
import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu.models import SpectrogramClassifier, train_step


def _task_batch(key, batch=32, sr=4000, dur=0.25, n_classes=4):
    """Class k = a tone at (k+1)*400 Hz in noise."""
    kf, kn, kc = jax.random.split(key, 3)
    labels = jax.random.randint(kc, (batch,), 0, n_classes)
    freqs = (labels + 1) * 400.0
    t = jnp.arange(int(sr * dur)) / sr
    clean = jnp.sin(2 * np.pi * freqs[:, None] * t[None, :])
    noise = 0.7 * jax.random.normal(kn, clean.shape)
    return (clean + noise).astype(jnp.float32), labels


def test_classifier_learns_frequency_task():
    model = SpectrogramClassifier(n_classes=4, sr=4000, n_fft=256,
                                  hop_length=64, n_mels=24)
    params = model.init_params

    @jax.jit
    def step(p, x, y):
        return train_step(model, p, x, y, lr=5e-2)

    key = jax.random.PRNGKey(0)
    first_loss = None
    for i in range(60):
        key, sub = jax.random.split(key)
        x, y = _task_batch(sub)
        loss, params = step(params, x, y)
        if first_loss is None:
            first_loss = float(loss)

    # evaluate
    key, sub = jax.random.split(key)
    x, y = _task_batch(sub, batch=128)
    logits = model.forward(params, x)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == y))
    assert float(loss) < first_loss * 0.7, (first_loss, float(loss))
    assert acc > 0.9, acc


def test_frontend_params_actually_move():
    model = SpectrogramClassifier(n_classes=4, sr=4000, n_fft=256,
                                  hop_length=64, n_mels=24)
    params = model.init_params
    key = jax.random.PRNGKey(1)
    x, y = _task_batch(key)
    _, new_params = train_step(model, params, x, y, lr=1e-2)
    for name in ("wsin", "wcos", "mel_basis", "head_w"):
        moved = float(jnp.abs(new_params[name] - params[name]).max())
        assert moved > 0, name
