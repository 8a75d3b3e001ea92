"""Inverse CQT (canonical-dual synthesis) and GriffinLimCQT.

Beyond-reference capability (librosa has icqt/griffinlim_cqt, the torch
reference has no way back from a CQT): acceptance is an fp64 numpy oracle
for the linear synthesis, time-domain SNR on in-band material at a
well-overlapped hop, and CQT-domain spectral convergence for the
magnitude-only loop.
"""
import warnings

import jax
import numpy as np
import pytest

from nnaudio_tpu import features


def _tones(sr=22050, secs=1.0, freqs=(110, 220, 440, 523.25, 660)):
    t = np.arange(int(sr * secs)) / sr
    return sum(np.sin(2 * np.pi * f * t + i)
               for i, f in enumerate(freqs)).astype(np.float32)[None]


def _dual_numpy(layer, normalization_type="librosa", eta=1e-3):
    """fp64 twin of CQT1992v2._dual_kernels."""
    kr = np.asarray(layer._params["cqt_kernels_real"], np.float64)
    ki = np.asarray(layer._params["cqt_kernels_imag"], np.float64)
    s = layer._norm_scale_np(normalization_type)
    A = s[:, None] * (kr - 1j * ki)
    B = np.conj(np.fft.fft(np.conj(A), axis=1))
    G = (np.abs(B) ** 2).sum(0)
    g0 = G.max() * eta
    Dh = layer.hop_length * np.conj(B) * (G > g0) / np.maximum(G, g0)
    return np.fft.ifft(Dh, axis=1)


def test_icqt_matches_fp64_numpy_oracle():
    """The jitted inverse is the same linear operator as an fp64 numpy
    dual-synthesis OLA (independent implementation of the same math)."""
    layer = features.CQT1992v2(sr=8000, fmin=100, n_bins=24,
                               bins_per_octave=12, hop_length=64,
                               output_format="Complex", verbose=False)
    rng = np.random.default_rng(0)
    T = 40
    X = rng.standard_normal((2, 24, T, 2)).astype(np.float32)

    got = np.asarray(layer.inverse(X))

    d = _dual_numpy(layer)
    W = layer.kernel_width
    hop = layer.hop_length
    Xc = X[..., 0].astype(np.float64) + 1j * X[..., 1].astype(np.float64)
    z = np.zeros((2, W + hop * (T - 1)), complex)
    for t in range(T):
        z[:, t * hop: t * hop + W] += np.einsum("bf,fw->bw", Xc[:, :, t], d)
    want = 2 * np.real(z)[:, W // 2: -(W // 2)]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4 * np.abs(want).max())


@pytest.mark.parametrize("normalization_type", ["librosa", "convolutional",
                                                "wrap"])
def test_icqt_roundtrip_snr(normalization_type):
    """CQT -> inverse reconstructs in-band tones at >40 dB interior SNR
    when the hop respects the shortest atom (measured ~53 dB)."""
    sr, hop = 22050, 128
    x = _tones(sr)
    layer = features.CQT1992v2(sr=sr, fmin=55, n_bins=48, hop_length=hop,
                               output_format="Complex", verbose=False)
    X = layer(x, normalization_type=normalization_type)
    xr = np.asarray(layer.inverse(X, normalization_type=normalization_type,
                                  length=x.shape[-1]))
    core = slice(4096, x.shape[-1] - 4096)
    err = xr[:, core] - x[:, core]
    snr = 10 * np.log10((x[:, core] ** 2).sum() / (err ** 2).sum())
    assert snr > 40, snr


def test_icqt_warns_on_undersampled_hop():
    """Default config (hop 512, 84 bins): the shortest atom is ~94 samples,
    so the top-octave envelopes are under-sampled — warn (the information
    loss is the operator's, a least-squares solve converges to the same
    quality)."""
    layer = features.CQT1992v2(sr=22050, hop_length=512, n_bins=84,
                               output_format="Complex", verbose=False)
    X = layer(_tones())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        layer.inverse(X)
    assert any("under-sampled" in str(x.message) for x in w)


def test_icqt_rejects_magnitude_input():
    layer = features.CQT1992v2(sr=8000, fmin=100, n_bins=24, hop_length=64,
                               verbose=False)
    with pytest.raises(AssertionError):
        layer.inverse(np.zeros((1, 24, 10), np.float32))


def test_icqt_grad_flows():
    """Gradients flow through the inverse (synthesis_ola's custom VJP)."""
    layer = features.CQT1992v2(sr=8000, fmin=100, n_bins=24, hop_length=64,
                               output_format="Complex", verbose=False)
    X = np.random.default_rng(1).standard_normal((1, 24, 8, 2)).astype(
        np.float32)

    g = jax.grad(lambda Xv: layer.inverse(Xv).sum())(X)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_dual_cache_invalidated_on_param_update():
    """The dual kernels are derived from the bank: persistently updating
    the kernels must clear the cache so inverse() rebuilds them."""
    layer = features.CQT1992v2(sr=8000, fmin=100, n_bins=24, hop_length=64,
                               output_format="Complex", verbose=False)
    layer._dual_kernels("librosa", 1e-3)
    assert layer._dual_cache
    layer.update_params(
        {"cqt_kernels_real": layer._params["cqt_kernels_real"] * 2.0})
    assert not layer._dual_cache


def test_griffinlim_cqt_spectral_convergence():
    """Magnitude-only inversion: 32 momentum iterations reach CQT-domain
    spectral convergence comparable to the STFT Griffin-Lim (measured
    0.119), and iterating must beat the zero-iteration start."""
    sr, hop = 22050, 128
    x = _tones(sr)
    cqt = features.CQT1992v2(sr=sr, fmin=55, n_bins=48, hop_length=hop,
                             output_format="Magnitude", verbose=False)
    S = np.asarray(cqt(x))

    def rel(n_iter):
        gl = features.GriffinLimCQT(sr=sr, fmin=55, n_bins=48,
                                    hop_length=hop, n_iter=n_iter,
                                    verbose=False)
        xr = np.asarray(gl(S, key=jax.random.PRNGKey(1),
                           length=x.shape[-1]))
        S2 = np.asarray(cqt(xr))
        m = min(S.shape[2], S2.shape[2])
        return (np.linalg.norm(S2[:, :, :m] - S[:, :, :m])
                / np.linalg.norm(S))

    r32 = rel(32)
    assert r32 < 0.2, r32
    assert r32 < rel(0) * 0.5


def test_griffinlim_cqt_iter_precision_highest():
    """The fp32-iteration variant reaches the same spectral convergence
    (fixed-point projection: per-iteration rounding does not accumulate)."""
    sr, hop = 22050, 128
    x = _tones(sr, secs=0.5)
    cqt = features.CQT1992v2(sr=sr, fmin=55, n_bins=48, hop_length=hop,
                             output_format="Magnitude", verbose=False)
    S = np.asarray(cqt(x))
    outs = {}
    for prec in ("default", "highest"):
        gl = features.GriffinLimCQT(sr=sr, fmin=55, n_bins=48,
                                    hop_length=hop, n_iter=16,
                                    iter_precision=prec, verbose=False)
        xr = np.asarray(gl(S, key=jax.random.PRNGKey(2)))
        S2 = np.asarray(cqt(xr))
        m = min(S.shape[2], S2.shape[2])
        outs[prec] = (np.linalg.norm(S2[:, :, :m] - S[:, :, :m])
                      / np.linalg.norm(S))
    assert abs(outs["default"] - outs["highest"]) < 0.05, outs


# ---------------------------------------------------------------- pyramid --
def _snr(xr, x, guard=4096):
    core = slice(guard, x.shape[-1] - guard)
    err = xr[:, core] - x[:, core]
    return 10 * np.log10((x[:, core] ** 2).sum() / (err ** 2).sum())


@pytest.mark.parametrize("normalization_type", ["librosa", "convolutional",
                                                "wrap"])
def test_icqt_2010v2_roundtrip_snr(normalization_type):
    """Pyramid inverse: the whole multirate pyramid collapses into ONE
    single-rate dual-synthesis matmul+OLA (effective atoms = decimation
    cascade ∗ upsampled bank); >40 dB interior SNR on in-band tones
    (measured ~50 dB)."""
    sr = 22050
    x = _tones(sr, freqs=(110, 220, 330, 440, 660))
    layer = features.CQT2010v2(sr=sr, fmin=55, n_bins=48, bins_per_octave=12,
                               hop_length=128, earlydownsample=False,
                               output_format="Complex", verbose=False)
    X = layer(x, normalization_type=normalization_type)
    xr = np.asarray(layer.inverse(X, normalization_type=normalization_type,
                                  length=x.shape[-1]))
    assert _snr(xr, x) > 40, _snr(xr, x)


def test_icqt_2010v2_early_downsample_reconstructs_original_rate():
    """With early downsampling active the inverse composes the early FIR
    into the effective atoms and reconstructs at the ORIGINAL sample rate
    (measured ~44 dB; the early lowpass costs a little quality near its
    transition band)."""
    sr = 22050
    x = _tones(sr, freqs=(110, 220, 330, 440, 660))
    layer = features.CQT2010v2(sr=sr, fmin=55, n_bins=48, bins_per_octave=12,
                               hop_length=64, earlydownsample=True,
                               output_format="Complex", verbose=False)
    assert layer.earlydownsample and layer.downsample_factor > 1
    X = layer(x)
    xr = np.asarray(layer.inverse(X, length=x.shape[-1]))
    assert xr.shape == x.shape
    assert _snr(xr, x) > 35, _snr(xr, x)


def test_icqt_vqt_gamma_roundtrip_snr():
    """VQT inverse (per-octave banks, γ>0 widened deep bandwidths):
    measured ~49 dB."""
    sr = 22050
    x = _tones(sr, freqs=(110, 220, 330, 440, 660))
    layer = features.VQT(sr=sr, fmin=55, n_bins=48, bins_per_octave=12,
                         hop_length=128, gamma=5.0, earlydownsample=False,
                         output_format="Complex", verbose=False)
    X = layer(x)
    xr = np.asarray(layer.inverse(X, length=x.shape[-1]))
    assert _snr(xr, x) > 40, _snr(xr, x)


def test_icqt_2010_legacy_roundtrip_snr():
    """CQT2010 (frequency-domain composed basis, UN-negated imag
    convention, 1/n_fft normalization quirks): measured ~50 dB."""
    sr = 22050
    x = _tones(sr, freqs=(110, 220, 330, 440, 660))
    layer = features.CQT2010(sr=sr, fmin=55, n_bins=48, bins_per_octave=12,
                             hop_length=128, earlydownsample=False,
                             output_format="Complex", verbose=False)
    X = layer(x)
    xr = np.asarray(layer.inverse(X, length=x.shape[-1]))
    assert _snr(xr, x) > 40, _snr(xr, x)


def test_icqt_pyramid_warns_on_undersampled_hop():
    layer = features.CQT2010v2(sr=22050, hop_length=512, n_bins=84,
                               output_format="Complex", verbose=False)
    X = layer(_tones())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        layer.inverse(X)
    assert any("under-sampled" in str(x.message) for x in w)


def test_icqt_pyramid_dual_cache_invalidated():
    layer = features.CQT2010v2(sr=22050, fmin=55, n_bins=48, hop_length=128,
                               earlydownsample=False,
                               output_format="Complex", verbose=False)
    layer._pyramid_dual_kernels("librosa", 1e-3)
    assert layer._dual_cache
    layer.update_params(
        {"cqt_kernels_real": layer._params["cqt_kernels_real"] * 2.0})
    assert not layer._dual_cache


@pytest.mark.parametrize("family,extra", [("2010v2", {}),
                                          ("vqt", {"gamma": 5.0})])
def test_griffinlim_cqt_pyramid_families(family, extra):
    """GriffinLimCQT over the pyramid families: the full multirate forward
    iterated against the collapsed single-rate dual synthesis (measured
    spectral convergence ~0.12, same as the 1992v2 loop)."""
    sr, hop = 22050, 128
    x = _tones(sr, freqs=(110, 220, 330, 440, 660))
    cls = features.CQT2010v2 if family == "2010v2" else features.VQT
    cqt = cls(sr=sr, fmin=55, n_bins=48, bins_per_octave=12, hop_length=hop,
              earlydownsample=False, output_format="Magnitude",
              verbose=False, **extra)
    S = np.asarray(cqt(x))
    gl = features.GriffinLimCQT(sr=sr, fmin=55, n_bins=48,
                                bins_per_octave=12, hop_length=hop,
                                family=family, earlydownsample=False,
                                n_iter=32, verbose=False, **extra)
    xr = np.asarray(gl(S, key=jax.random.PRNGKey(1), length=x.shape[-1]))
    S2 = np.asarray(cqt(xr))
    m = min(S.shape[2], S2.shape[2])
    rel = np.linalg.norm(S2[:, :, :m] - S[:, :, :m]) / np.linalg.norm(S)
    assert rel < 0.2, rel


def test_griffinlim_cqt_rejects_unknown_family():
    with pytest.raises(ValueError):
        features.GriffinLimCQT(family="2010", verbose=False)


def test_griffinlim_cqt_pyramid_under_parallel_chain():
    """Regression (round-4 review): the pyramid cascades moved to derived
    state; GriffinLimCQT.apply must still feed them to the in-loop pyramid
    forward when use_parallel_chain is on (it salts on that toggle)."""
    from nnaudio_tpu import set_use_parallel_chain

    sr, hop = 22050, 128
    x = _tones(sr, secs=0.5, freqs=(110, 220, 440))
    cqt = features.CQT2010v2(sr=sr, fmin=55, n_bins=48, bins_per_octave=12,
                             hop_length=hop, earlydownsample=False,
                             output_format="Magnitude", verbose=False)
    S = np.asarray(cqt(x))
    gl = features.GriffinLimCQT(sr=sr, fmin=55, n_bins=48,
                                bins_per_octave=12, hop_length=hop,
                                family="2010v2", earlydownsample=False,
                                n_iter=4, verbose=False)
    try:
        set_use_parallel_chain(True)
        xr = np.asarray(gl(S, key=jax.random.PRNGKey(0)))
    finally:
        set_use_parallel_chain(None)
    assert np.isfinite(xr).all()


def test_griffinlim_cqt_update_params_rebuilds_duals():
    """Regression (round-4 review): a persistent kernel update must reach
    BOTH halves of the fixed point — the merged analysis params AND the
    synthesis duals (plus drop compiled steps that captured the old ones)."""
    gl = features.GriffinLimCQT(sr=8000, fmin=100, n_bins=24, hop_length=64,
                                n_iter=2, verbose=False)
    # enough frames that the synthesized signal exceeds the in-loop
    # reflect pad (kernel_width//2)
    S = np.abs(np.random.default_rng(0).standard_normal(
        (1, 24, 24))).astype(np.float32)
    gl(S)  # populate the jit cache
    old_kc = np.asarray(gl._dual_kc).copy()
    assert gl._jit_cache
    gl.update_params(
        {"cqt_kernels_real": gl._params["cqt_kernels_real"] * 2.0})
    assert not gl._jit_cache  # compiled steps captured the old duals
    assert np.abs(np.asarray(gl._dual_kc) - old_kc).max() > 0
    # inner transform stayed in lock-step
    np.testing.assert_array_equal(
        np.asarray(gl._cqt._params["cqt_kernels_real"]),
        np.asarray(gl._params["cqt_kernels_real"]))


def test_streaming_inverse_cqt_validates_inputs():
    from nnaudio_tpu import streaming

    with pytest.raises(ValueError):
        streaming.StreamingInverseCQT(sr=22050, fmin=55, n_bins=48,
                                      hop_length=128,
                                      normalization_type="Librosa",
                                      verbose=False)
    s = streaming.StreamingInverseCQT(sr=22050, fmin=55, n_bins=48,
                                      hop_length=128, verbose=False)
    with pytest.raises(ValueError):
        s.step(s.init_state(1), np.zeros((1, 48, 4), np.float32))


def test_icqt_1992_composed_basis_roundtrip_snr():
    """CQT1992 (frequency-domain class, frozen composed basis with the
    1/kernel_width normalization): measured ~52 dB — every CQT class now
    inverts through the shared _FlatCQTInverse/_PyramidCQT machinery."""
    sr = 22050
    x = _tones(sr, freqs=(110, 220, 440, 660))
    layer = features.CQT1992(sr=sr, fmin=55, n_bins=48, hop_length=128,
                             output_format="Complex")
    X = layer(x)
    xr = np.asarray(layer.inverse(X, length=x.shape[-1]))
    assert _snr(xr, x) > 40, _snr(xr, x)


def test_icqt_1992_trainable_raises():
    layer = features.CQT1992(sr=8000, fmin=100, n_bins=24, hop_length=64,
                             output_format="Complex", trainable_CQT=True)
    X = np.zeros((1, 24, 30, 2), np.float32)
    with pytest.raises(NotImplementedError):
        layer.inverse(X)


def test_griffinlim_cqt_short_clip_constant_pad_fallback():
    """A clip short enough that the forward CQT warns and falls back to
    constant padding must also be Griffin-Lim-invertible: the in-loop
    re-analysis shares the forward's _center_pad fallback instead of
    raising an opaque reflect-pad error."""
    sr, hop = 22050, 128
    x = _tones(sr, secs=0.15)  # shorter than kernel_width//2 = 4096
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cqt = features.CQT1992v2(sr=sr, fmin=55, n_bins=48, hop_length=hop,
                                 output_format="Magnitude", verbose=False)
        S = np.asarray(cqt(x))
        gl = features.GriffinLimCQT(sr=sr, fmin=55, n_bins=48,
                                    hop_length=hop, n_iter=4, verbose=False)
        xr = np.asarray(gl(S, length=x.shape[-1]))
    assert xr.shape == x.shape
    assert np.isfinite(xr).all()


def test_griffinlim_cqt_apply_rejects_kernel_overrides():
    """apply-time bank overrides would desynchronize the fixed point (the
    synthesis duals are host-built): must raise, naming update_params."""
    import jax.numpy as jnp

    gl = features.GriffinLimCQT(sr=8000, fmin=100, n_bins=24,
                                hop_length=64, n_iter=2, verbose=False)
    S = jnp.ones((1, 24, 12), jnp.float32)
    kr = gl._params["cqt_kernels_real"]
    with pytest.raises(ValueError, match="update_params"):
        gl.apply({"cqt_kernels_real": kr * 1.1}, S)
    # non-bank params (none exist today) and params=None still work
    out = gl.apply(None, S)
    assert np.isfinite(np.asarray(out)).all()
