"""Independent fp64 VQT oracle for gamma > 0.

``librosa.vqt`` (the reference's only gamma>0 oracle,
``/root/reference/Installation/tests/test_vqt.py:45-61``) is not installable
in this image, and the live torch-reference parity tier shares the same
per-octave kernel recipe as this package — a common-mode VQT bug would pass
it. This oracle is independent of both: it evaluates the *direct* (non-
pyramid) variable-Q response in NumPy fp64 — per-bin wavelet
``hann(l) * exp(j 2π f t / sr) / l`` (L1-normalized, librosa
``sqrt(length)`` scaling) correlated against the reflect-padded signal at
full rate, no downsampling, no lowpass, no framing kernels.

Validation of the oracle itself: at gamma=0 it matches CQT1992v2 (a direct
single-bank transform with an unrelated code path) to ~1e-7. Against the
pyramid VQT it is held to the reference's librosa tolerances
(``np.allclose(V1, V2, 1e-3, 0.8)``) plus a much tighter mean-error bound —
the pyramid's lowpass/decimation error is ~1e-3 on average, so a subtle
normalization or octave-stitching bug would trip the mean long before the
reference tolerance.
"""
import numpy as np
import pytest
from scipy.signal import get_window

from nnaudio_tpu import features


def direct_vqt_oracle(x, sr=22050, hop=512, fmin=32.70, n_bins=84, bpo=12,
                      gamma=0.0, filter_scale=1.0):
    """fp64 direct variable-Q magnitude response, librosa-normalized.

    Mirrors the *definition* the pyramid approximates (reference
    utils.py:399-473 wavelet recipe; librosa vqt normalization): per-bin
    length ``ceil(Q*sr/(f + gamma/alpha))``, centered support
    ``np.r_[-l//2 : l//2]``, magnitude scaled by ``sqrt(length)``.
    """
    x = np.asarray(x, np.float64)
    Q = filter_scale / (2 ** (1 / bpo) - 1)
    alpha = 2 ** (1 / bpo) - 1
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bpo)
    lengths = np.ceil(Q * sr / (freqs + gamma / alpha))
    T = len(x) // hop + 1
    pad = int(lengths.max()) // 2 + 1
    xe = np.pad(x, pad, mode="reflect")
    out = np.zeros((n_bins, T))
    centers = np.arange(T) * hop + pad
    for k in range(n_bins):
        l = int(lengths[k])
        t_idx = np.r_[-l // 2 : l // 2]
        w = get_window("hann", l, fftbins=True) * np.exp(
            1j * 2 * np.pi * freqs[k] * t_idx / sr) / l
        w = w / np.abs(w).sum()  # L1 norm (basis_norm=1)
        frames = xe[centers[:, None] + t_idx[None, :]]
        out[k] = np.abs(frames @ np.conj(w)) * np.sqrt(lengths[k])
    return out


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(42)
    return (rng.standard_normal(22050 * 3) * 0.15).astype(np.float32)


def test_oracle_self_check_gamma_zero_vs_cqt1992v2(audio):
    """The oracle's own math validated against an unrelated code path: the
    single-bank CQT1992v2 is direct (no pyramid), so at gamma=0 the two
    should agree to float32 precision."""
    c92 = features.CQT1992v2(sr=22050, verbose=False)
    got = np.asarray(
        c92(audio[None], output_format="Magnitude",
            normalization_type="librosa"))[0]
    want = direct_vqt_oracle(audio, gamma=0.0)
    T = min(got.shape[1], want.shape[1])
    np.testing.assert_allclose(got[:, :T], want[:, :T], rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("gamma", [1, 2, 5, 10])
def test_vqt_gamma_against_direct_oracle(audio, gamma):
    vq = features.VQT(sr=22050, gamma=gamma, verbose=False)
    got = np.asarray(
        vq(audio[None], output_format="Magnitude",
           normalization_type="librosa"))[0]
    want = direct_vqt_oracle(audio, gamma=float(gamma))
    T = min(got.shape[1], want.shape[1])
    got, want = got[:, :T], want[:, :T]
    # the reference's exact librosa tolerance (test_vqt.py:61)
    assert np.allclose(want, got, 1e-3, 0.8)
    # and a far tighter aggregate bound: pyramid lowpass/decimation error is
    # ~1.5e-3 mean (measured 0.0015-0.0023 over gamma 1..10); a scaling or
    # octave-stitching bug would blow straight past 0.02
    assert np.abs(got - want).mean() < 0.02
    assert np.abs(got - want).max() < 0.5
