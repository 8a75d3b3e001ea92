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


def test_trainable_istft_gradients():
    """Gradients flow through the standalone iSTFT's trainable kernels and
    window (reference: separately trainable iSTFT, stft.py:439-524) and are
    finite and nonzero; window gradient matches finite differences."""
    from nnaudio_tpu import features

    n_fft, hop = 256, 64
    ist = features.iSTFT(n_fft=n_fft, hop_length=hop,
                         trainable_kernels=True, trainable_window=True,
                         verbose=False)
    st = features.STFT(n_fft=n_fft, hop_length=hop, output_format="Complex",
                       verbose=False)
    x = np.random.RandomState(0).randn(2, 2048).astype(np.float32)
    X = jnp.asarray(st(x))
    params = ist.trainable_params()
    assert set(params) >= {"kernel_cos", "kernel_sin", "window_mask"}

    def loss(p):
        rec = ist.apply(p, X, onesided=True, length=2048)
        return jnp.sum((rec - jnp.asarray(x)) ** 2)

    grads = jax.grad(loss)(params)
    for k, g in grads.items():
        assert bool(jnp.isfinite(g).all()), k
        assert float(jnp.abs(g).max()) > 0, k

    # finite-difference check on one window element
    eps = 1e-3
    i = 40
    p_plus = dict(params)
    p_plus["window_mask"] = params["window_mask"].at[i].add(eps)
    p_minus = dict(params)
    p_minus["window_mask"] = params["window_mask"].at[i].add(-eps)
    fd = (float(loss(p_plus)) - float(loss(p_minus))) / (2 * eps)
    an = float(grads["window_mask"][i])
    assert np.isclose(fd, an, rtol=5e-2, atol=1e-2), (fd, an)


def test_gradients_through_every_trainable_family():
    """Finite, nonzero gradients for the trainable switches not covered
    elsewhere: Gammatonegram bins, ChromaSTFT chroma, CQT2010v2 and VQT
    wavelet banks (CQT1992v2/CQT1992 are covered by the sharding tests,
    Mel/STFT by test_mel/test_utils)."""
    from nnaudio_tpu import features

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8192).astype(np.float32))

    cases = [
        (features.Gammatonegram(sr=16000, n_fft=512, hop_length=256,
                                trainable_bins=True, verbose=False),
         {}, ["gammatone_basis"]),
        (features.ChromaSTFT(sr=16000, n_fft=512, hop_length=256,
                             trainable_chroma=True, verbose=False),
         {}, ["chroma_basis"]),
        (features.CQT2010v2(sr=16000, fmin=55, n_bins=24, bins_per_octave=12,
                            hop_length=256, trainable=True, verbose=False),
         dict(output_format="Magnitude", normalization_type="librosa"),
         ["cqt_kernels_real", "cqt_kernels_imag"]),
    ]
    # reference quirk (vqt.py:136-140): VQT's trainable flag only toggles
    # the magnitude epsilon — its per-octave kernels stay frozen buffers
    vq = features.VQT(sr=16000, fmin=55, n_bins=24, bins_per_octave=12,
                      hop_length=256, gamma=2, trainable=True, verbose=False)
    assert vq.trainable_params() == {}
    for layer, kwargs, expect_keys in cases:
        params = layer.trainable_params()
        for k in expect_keys:
            assert k in params, (type(layer).__name__, k, sorted(params))

        def loss(p):
            return jnp.sum(layer.apply(p, x, **kwargs) ** 2)

        grads = jax.grad(loss)(params)
        for k, g in grads.items():
            assert bool(jnp.isfinite(g).all()), (type(layer).__name__, k)
            assert float(jnp.abs(g).max()) > 0, (type(layer).__name__, k)
