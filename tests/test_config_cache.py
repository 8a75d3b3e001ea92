"""Config-aware jit caching: toggling ``fast_mode()`` / the pallas switches
must take effect on a transform that has ALREADY been called.

Matmul precision and the pallas dispatch choices are read from the global
config at trace time; before round 3 the jit cache was keyed on static
kwargs only, so a transform first called at HIGHEST silently kept serving
the HIGHEST graph inside ``fast_mode()`` (reference precision contract,
SURVEY §7 "Numerics"). These tests wrap ``_forward`` with a recorder and
assert the ambient config seen by each fresh trace.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnaudio_tpu.config import fast_mode, get_config, set_use_pallas
from nnaudio_tpu.features import STFT, Griffin_Lim, iSTFT


def _record_traces(transform, log):
    orig = transform._forward

    def wrapped(*a, **k):
        log.append(get_config().matmul_precision)
        return orig(*a, **k)

    transform._forward = wrapped


def test_fast_mode_retraces_used_transform():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4096), jnp.float32)
    t = STFT(n_fft=512, hop_length=128, output_format="Magnitude",
             verbose=False)
    log = []
    _record_traces(t, log)

    t(x)
    assert log == ["highest"]

    with fast_mode():
        t(x)  # must trace a NEW graph at the fast precision
    assert log == ["highest", "default"]

    t(x)  # back at ambient: cache hit on the original entry, no re-trace
    assert log == ["highest", "default"]

    with fast_mode():
        t(x)  # second fast call: cache hit on the fast entry
    assert log == ["highest", "default"]


def test_pallas_switch_retraces():
    x = jnp.asarray(np.random.RandomState(1).randn(2, 4096), jnp.float32)
    t = STFT(n_fft=512, hop_length=128, output_format="Magnitude",
             verbose=False)
    log = []
    _record_traces(t, log)
    t(x)
    assert len(log) == 1
    prev = get_config().use_pallas
    try:
        set_use_pallas(not prev)
        t(x)
        assert len(log) == 2
    finally:
        set_use_pallas(prev)


def test_inverse_cache_is_config_aware():
    x = jnp.asarray(np.random.RandomState(2).randn(2, 4096), jnp.float32)
    t = STFT(n_fft=512, hop_length=128, iSTFT=True, verbose=False)
    X = t(x, output_format="Complex")
    t.inverse(X, onesided=True, length=x.shape[-1])
    n_before = len(t._jit_cache)
    with fast_mode():
        t.inverse(X, onesided=True, length=x.shape[-1])
    assert len(t._jit_cache) == n_before + 1


def test_griffin_lim_cache_is_config_aware():
    gl = Griffin_Lim(n_fft=256, n_iter=2, hop_length=64)
    S = jnp.abs(jnp.asarray(
        np.random.RandomState(3).randn(1, 129, 40), jnp.float32))
    gl(S)
    n_before = len(gl._jit_cache)
    with fast_mode():
        gl(S)
    assert len(gl._jit_cache) == n_before + 1


def test_fast_mode_numerics_unchanged_on_reused_transform():
    # the retrace must not change results on CPU (precision flags are
    # TPU-visible only) — guards against cache-key plumbing bugs
    x = jnp.asarray(np.random.RandomState(4).randn(2, 4096), jnp.float32)
    t = STFT(n_fft=512, hop_length=128, output_format="Magnitude",
             verbose=False)
    y1 = np.asarray(t(x))
    with fast_mode():
        y2 = np.asarray(t(x))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-5)


def test_unrelated_toggle_does_not_retrace():
    """Round-3c: the cache salts per transform on only the config fields its
    graph reads — flipping use_mxu_fft (read only by CFP) or the fused-
    pyramid switch must NOT retrace an already-used STFT (a spurious retrace
    costs a full XLA/Mosaic recompile, 60-90 s for the fused kernels)."""
    from nnaudio_tpu.config import (set_use_fused_pyramid, set_use_mxu_fft,
                                    set_use_pallas_synthesis)

    x = jnp.asarray(np.random.RandomState(5).randn(2, 4096), jnp.float32)
    t = STFT(n_fft=512, hop_length=128, output_format="Magnitude",
             verbose=False)
    log = []
    _record_traces(t, log)
    t(x)
    assert len(log) == 1
    try:
        set_use_mxu_fft(True)
        set_use_fused_pyramid(False)
        set_use_pallas_synthesis(True)
        t(x)  # STFT's forward reads none of these
        assert len(log) == 1, "unrelated toggles must not retrace STFT"
    finally:
        set_use_mxu_fft(None)
        set_use_fused_pyramid(None)
        set_use_pallas_synthesis(None)


def test_salt_fields_cover_read_toggles():
    """Each narrowed _salt_fields tuple must name real config fields (guards
    against typos silently widening the cache key to nothing)."""
    import nnaudio_tpu.config as cfg
    from nnaudio_tpu import features as F

    valid = set(cfg._SALT_FIELDS)
    classes = [F.STFT, F.iSTFT, F.MelSpectrogram, F.MFCC, F.CQT1992,
               F.CQT1992v2, F.CQT2010, F.CQT2010v2, F.VQT, F.Gammatonegram,
               F.ChromaSTFT, F.Griffin_Lim, F.Combined_Frequency_Periodicity,
               F.CFP, F.InverseMelSpectrogram]
    for cls in classes:
        assert set(cls._salt_fields) <= valid, cls
        assert "matmul_precision" in cls._salt_fields, cls
    # the base-class default documents itself as the FULL set (safe for any
    # subclass) — a new config toggle added to _SALT_FIELDS must land there
    # too or a subclass relying on the default silently under-salts
    from nnaudio_tpu.features.base import SpectralTransform

    assert set(SpectralTransform._salt_fields) == valid


def test_parallel_chain_toggle_retraces_pyramid():
    """Flipping use_parallel_chain must retrace an already-used CQT2010v2
    (it is in the pyramid family's _salt_fields) and the two traces must
    agree numerically."""
    import numpy as np
    from nnaudio_tpu import features
    from nnaudio_tpu.config import set_use_parallel_chain

    x = np.random.RandomState(0).randn(1, 44100).astype(np.float32)
    layer = features.CQT2010v2(sr=22050, hop_length=512, n_bins=84,
                               bins_per_octave=12, verbose=False)
    a = np.asarray(layer(x))
    n_cached = len(layer._jit_cache)
    try:
        set_use_parallel_chain(True)
        b = np.asarray(layer(x))
    finally:
        set_use_parallel_chain(None)
    assert len(layer._jit_cache) == n_cached + 1, "toggle must retrace"
    np.testing.assert_allclose(b, a, atol=2e-5 * np.abs(a).max(), rtol=1e-4)


def test_pallas_analysis_toggle_retraces():
    """set_use_pallas_analysis changes the analysis dispatch at trace time
    (round-5 policy) — an already-used STFT must retrace on the toggle, and
    the two graphs must agree numerically."""
    from nnaudio_tpu.config import set_use_pallas_analysis

    x = jnp.asarray(np.random.RandomState(7).randn(2, 4096), jnp.float32)
    t = STFT(n_fft=512, hop_length=128, output_format="Magnitude",
             verbose=False)
    a = np.asarray(t(x))
    n_cached = len(t._jit_cache)
    try:
        set_use_pallas_analysis(False)
        b = np.asarray(t(x))
    finally:
        set_use_pallas_analysis(None)
    assert len(t._jit_cache) == n_cached + 1, "toggle must retrace"
    np.testing.assert_allclose(b, a, atol=2e-5 * np.abs(a).max(), rtol=1e-4)
