"""Fused whole-pyramid contraction (ops/pyramid.py) vs the per-octave loop.

The fused path restructures CQT2010/CQT2010v2/VQT into one batched einsum;
these tests pin (a) the gather-free frame materializer against the gather
framer, (b) feature-level fused == loop parity across the family, and
(c) gradient equality for the trainable shared-bank case (the fused path's
per-level bank stack must sum cotangents exactly like per-octave calls).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnaudio_tpu import features
from nnaudio_tpu.config import set_use_fused_pyramid
from nnaudio_tpu.core.frame import frame_signal, num_frames
from nnaudio_tpu.ops.pyramid import materialize_frames, pyramid_basis_pair


@pytest.fixture
def fused_off_after():
    yield
    set_use_fused_pyramid(None)


@pytest.mark.parametrize(
    "width,hop",
    [
        (256, 512),  # hop > width: top octave
        (256, 256),  # pure reshape
        (256, 128),
        (256, 8),    # deep octave: 32 chunks
        (240, 36),   # gcd path (g=12, 20 chunks)
        (250, 3),    # >64 chunks: gather fallback
    ],
)
def test_materialize_frames_matches_gather(width, hop):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 4096).astype(np.float32))
    t = num_frames(4096, width, hop)
    got = materialize_frames(x, width, hop)
    want = frame_signal(x, width, hop)
    assert got.shape == (3, t, width)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_materialize_frames_forced_count_pads():
    # t beyond what the signal holds: trailing frames read zero padding
    x = jnp.asarray(np.arange(20, dtype=np.float32))[None]
    got = np.asarray(materialize_frames(x, 8, 4, t=5))
    assert got.shape == (1, 5, 8)
    np.testing.assert_array_equal(got[0, 4], [16, 17, 18, 19, 0, 0, 0, 0])


def test_pyramid_basis_pair_mismatched_frames_returns_none():
    levels = [jnp.zeros((1, 1024)), jnp.zeros((1, 400))]
    br = [jnp.zeros((4, 64))] * 2
    assert pyramid_basis_pair(levels, br, br, [64, 32]) is None


@pytest.mark.parametrize(
    "build",
    [
        lambda: features.VQT(sr=22050, hop_length=512, n_bins=84,
                             bins_per_octave=12, gamma=2, verbose=False),
        lambda: features.CQT2010v2(sr=22050, hop_length=512, n_bins=84,
                                   bins_per_octave=12, verbose=False),
        lambda: features.CQT2010v2(sr=22050, hop_length=512, n_bins=80,
                                   bins_per_octave=12, pad_mode="constant",
                                   verbose=False),
        lambda: features.CQT2010(sr=22050, hop_length=512, n_bins=84,
                                 bins_per_octave=12, verbose=False),
    ],
)
@pytest.mark.parametrize("output_format", ["Magnitude", "Complex"])
def test_fused_matches_loop(build, output_format, fused_off_after):
    x = np.random.RandomState(1).randn(2, 44100).astype(np.float32)
    m = build()
    set_use_fused_pyramid(True)
    y_fused = np.asarray(m(x, output_format=output_format))
    set_use_fused_pyramid(False)
    y_loop = np.asarray(m(x, output_format=output_format))
    scale = np.abs(y_loop).max()
    np.testing.assert_allclose(y_fused, y_loop, atol=2e-5 * scale)


def test_fused_trainable_gradients_match_loop(fused_off_after):
    """Trainable CQT2010v2: the shared bank appears once per level in the
    fused stack; its gradient must equal the per-octave loop's sum."""
    x = jnp.asarray(np.random.RandomState(2).randn(1, 22050).astype(np.float32))
    m = features.CQT2010v2(sr=22050, hop_length=512, n_bins=84,
                           bins_per_octave=12, trainable=True, verbose=False)
    params = {k: jnp.asarray(v) for k, v in m._params.items()}

    def loss(p, xx):
        return jnp.sum(m._forward(p, xx, output_format="Magnitude") ** 2)

    set_use_fused_pyramid(True)
    g_fused = jax.grad(loss)(params, x)
    set_use_fused_pyramid(False)
    g_loop = jax.grad(loss)(params, x)
    for key in ("cqt_kernels_real", "cqt_kernels_imag"):
        a, b = np.asarray(g_fused[key]), np.asarray(g_loop[key])
        np.testing.assert_allclose(a, b, atol=1e-4 * np.abs(b).max())
