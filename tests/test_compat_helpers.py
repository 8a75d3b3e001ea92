"""Function-level compat surface vs the live reference (utils.py helpers).

The reference star-exports its torch utility functions through
``nnAudio.features`` (features/__init__.py:6-14); downstream code uses them
directly. Each helper here is checked head-to-head against the reference
implementation where the mount is available, numpy-only otherwise.
"""
import sys

import numpy as np
import pytest

from nnaudio_tpu import compat, features

REF = "/root/reference/Installation"


@pytest.fixture(scope="module")
def ref_utils():
    sys.path.insert(0, REF)
    try:
        import scipy.signal

        if not hasattr(scipy.signal, "blackmanharris"):
            scipy.signal.blackmanharris = scipy.signal.windows.blackmanharris
        import torch  # noqa: F401
        from nnAudio import utils as ref_utils
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference unavailable: {e}")
    return ref_utils


@pytest.fixture(scope="module")
def torchmod():
    import torch

    return torch


def test_namespace_exports():
    """Every functional name the reference leaks through nnAudio.features
    exists here too (import-pollution names like ``torch``/``np`` excluded)."""
    for name in [
        "STFTBase", "broadcast_dim", "complex_mul", "downsampling_by_2",
        "downsampling_by_n", "early_downsample", "early_downsample_count",
        "extend_fbins", "fft2gammatonemx", "get_cqt_complex", "normalize",
        "overlap_add", "prepow2", "nextpow2", "rfft_fn", "tiny",
        "torch_window_sumsquare", "uniform_distribution", "epsilon",
        "sz_float", "create_fourier_kernels", "create_cqt_kernels",
        "get_mel", "get_window_dispatch",
    ]:
        assert hasattr(features, name), name


def test_complex_mul_parity(ref_utils, torchmod):
    rng = np.random.RandomState(0)
    kr, ki = rng.randn(2, 12, 33).astype(np.float32)
    fr, fi = rng.randn(2, 3, 33, 21).astype(np.float32)
    want_r, want_i = ref_utils.complex_mul(
        (torchmod.tensor(kr), torchmod.tensor(ki)),
        (torchmod.tensor(fr), torchmod.tensor(fi)),
    )
    got_r, got_i = compat.complex_mul((kr, ki), (fr, fi))
    assert np.allclose(got_r, want_r.numpy(), rtol=1e-5, atol=1e-5)
    assert np.allclose(got_i, want_i.numpy(), rtol=1e-5, atol=1e-5)


def test_overlap_add_parity(ref_utils, torchmod):
    rng = np.random.RandomState(1)
    X = rng.randn(2, 64, 9).astype(np.float32)  # (B, n_fft, T)
    want = ref_utils.overlap_add(torchmod.tensor(X), 16).numpy()
    got = np.asarray(compat.overlap_add(X, 16))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5)


def test_window_sumsquare_parity(ref_utils, torchmod):
    w = np.hanning(64).astype(np.float32)
    want = ref_utils.torch_window_sumsquare(
        torchmod.tensor(w), n_frames=7, stride=16, n_fft=64).numpy().ravel()
    got = np.asarray(compat.torch_window_sumsquare(w, 7, 16, 64))
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


def test_downsampling_by_2_parity(ref_utils, torchmod):
    rng = np.random.RandomState(2)
    x = rng.randn(2, 1, 1000).astype(np.float32)
    fk = compat.create_lowpass_filter(0.5, 256, 0.03)
    want = ref_utils.downsampling_by_2(
        torchmod.tensor(x), torchmod.tensor(fk[None, None, :])).numpy()
    got = np.asarray(compat.downsampling_by_2(x, fk))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-4, atol=1e-5)


def test_extend_fbins_parity(ref_utils, torchmod):
    rng = np.random.RandomState(3)
    X = rng.randn(1, 9, 4, 2).astype(np.float32)  # n_fft=16 onesided
    want = ref_utils.extend_fbins(torchmod.tensor(X)).numpy()
    got = np.asarray(compat.extend_fbins(X))
    assert np.allclose(got, want, rtol=1e-6, atol=1e-6)


def test_get_cqt_complex_parity(ref_utils, torchmod):
    rng = np.random.RandomState(4)
    x = rng.randn(2, 1, 2048).astype(np.float32)
    kr = rng.randn(8, 256).astype(np.float32)
    ki = rng.randn(8, 256).astype(np.float32)
    pad = torchmod.nn.ReflectionPad1d(128)
    want = ref_utils.get_cqt_complex(
        torchmod.tensor(x), torchmod.tensor(kr[:, None, :]),
        torchmod.tensor(ki[:, None, :]), 64, pad).numpy()
    got = np.asarray(compat.get_cqt_complex(x, kr[:, None, :],
                                            ki[:, None, :], 64, "reflect"))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4)
    # the reference's own padding MODULES must map by type (round 3c:
    # a ConstantPad1d used to silently become reflect)
    got_mod = np.asarray(compat.get_cqt_complex(x, kr[:, None, :],
                                                ki[:, None, :], 64, pad))
    assert np.allclose(got_mod, want, rtol=1e-4, atol=1e-4)
    pad_c = torchmod.nn.ConstantPad1d(128, 0.0)
    want_c = ref_utils.get_cqt_complex(
        torchmod.tensor(x), torchmod.tensor(kr[:, None, :]),
        torchmod.tensor(ki[:, None, :]), 64, pad_c).numpy()
    got_c = np.asarray(compat.get_cqt_complex(x, kr[:, None, :],
                                              ki[:, None, :], 64, pad_c))
    assert np.allclose(got_c, want_c, rtol=1e-4, atol=1e-4)
    assert not np.allclose(want_c, want)  # the two modes genuinely differ
    with pytest.raises(TypeError):
        compat.get_cqt_complex(x, kr[:, None, :], ki[:, None, :], 64, object())


def test_rfft_fn_parity(ref_utils, torchmod):
    rng = np.random.RandomState(5)
    x = rng.randn(3, 128).astype(np.float32)
    want = ref_utils.rfft_fn(torchmod.tensor(x)).numpy()
    got = np.asarray(compat.rfft_fn(x))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4)


def test_early_downsample_parity(ref_utils):
    want = ref_utils.early_downsample(22050, 512, 7, 11025.0, 2000.0)
    got = compat.early_downsample(22050, 512, 7, 11025.0, 2000.0)
    assert got == tuple(want)


def test_fft2gammatonemx_parity():
    """Shape/normalization sanity vs the librosa_functions version semantics
    (the weights themselves are covered by Gammatonegram parity tests)."""
    wts, gain = compat.fft2gammatonemx(sr=16000, n_fft=1024, n_bins=32,
                                       fmax=8000, maxlen=513)
    assert wts.shape == (32, 513)
    assert gain.shape == (32,)
    assert np.isfinite(wts).all()


def test_normalize_and_tiny():
    rng = np.random.RandomState(6)
    S = rng.randn(8, 5).astype(np.float32)
    out = compat.normalize(S, norm=np.inf, axis=0)
    assert np.allclose(np.abs(out).max(axis=0), 1.0)
    out2 = compat.normalize(S, norm=2, axis=0)
    assert np.allclose(np.linalg.norm(out2, axis=0), 1.0, rtol=1e-5)
    assert compat.tiny(S) == np.finfo(np.float32).tiny
    # dtype preservation (reference: np.empty_like(S)) — float32 in/out,
    # complex normalized by |.| without dropping the imaginary part
    assert out.dtype == np.float32
    C = (S + 1j * S[::-1]).astype(np.complex64)
    outc = compat.normalize(C, norm=2, axis=0)
    assert np.iscomplexobj(outc)
    assert np.allclose(np.linalg.norm(outc, axis=0), 1.0, rtol=1e-5)
    # axis=None (librosa-supported): one global norm
    outg = compat.normalize(S, norm=2, axis=None)
    assert np.allclose(np.sqrt((np.abs(outg) ** 2).sum()), 1.0, rtol=1e-5)


def test_chroma_tuning_parity():
    """The 4th parameter is ``tuning`` (fractional chroma bins), as in
    librosa_functions.py:573 — round 3c fixed an A440-Hz misreading."""
    import inspect

    params = list(inspect.signature(compat.chroma).parameters)
    assert params[3] == "tuning"
    fb0 = compat.chroma(22050, 2048, tuning=0.0)
    fb5 = compat.chroma(22050, 2048, tuning=0.5)
    assert fb0.shape == (12, 1025) and np.isfinite(fb0).all()
    assert np.isfinite(fb5).all() and not np.allclose(fb0, fb5)


def test_fft2gammatonemx_defaults_match_reference():
    import inspect

    assert inspect.signature(compat.fft2gammatonemx).parameters[
        "fmax"].default == 11025  # librosa_functions.py:14


def test_prepow2_nextpow2(ref_utils):
    """Head-to-head vs the live reference: nextpow2 is CEIL (utils.py:148),
    prepow2 is floor (utils.py:172) — round 3c fixed a misreading that had
    both as floor."""
    for v in (6, 513, 1000, 1024, 768):
        assert compat.nextpow2(v) == ref_utils.nextpow2(v), v
        assert compat.prepow2(v) == ref_utils.prepow2(v), v
    assert compat.nextpow2(1000) == 10
    assert compat.prepow2(1000) == 9


def test_uniform_distribution_range():
    import jax

    out = np.asarray(compat.uniform_distribution(
        -2.0, 3.0, 100, key=jax.random.PRNGKey(1)))
    assert out.shape == (100,)
    assert (out >= -2.0).all() and (out <= 3.0).all()
