"""VQT correctness: gamma=0 equivalence with CQT2010v2 and gamma behavior.

The reference's strongest VQT check is bit-identity of ``VQT(gamma=0)`` with
``CQT2010v2`` (test_vqt.py:29-41); its librosa comparison (atol=0.8) is not
reproducible here without librosa, so gamma>0 is covered by structural
properties: window lengths shrink with gamma, hence sparser low-frequency
energy spread.
"""
import numpy as np
import pytest

from nnaudio_tpu import features


def test_vqt_gamma_zero_equals_cqt2010v2():
    x = np.random.RandomState(0).randn(1, 22050).astype(np.float32)
    vqt = features.VQT(sr=22050, gamma=0, verbose=False)
    cqt = features.CQT2010v2(sr=22050, verbose=False)
    out_v = np.asarray(vqt(x, output_format="Magnitude"))
    out_c = np.asarray(cqt(x, output_format="Magnitude"))
    assert np.array_equal(out_v, out_c)


@pytest.mark.parametrize("gamma", [1, 2, 5, 10])
def test_vqt_gamma_shapes_and_lengths(gamma):
    x = np.random.RandomState(1).randn(1, 22050).astype(np.float32)
    vqt = features.VQT(sr=22050, gamma=gamma, verbose=False)
    out = np.asarray(vqt(x))
    assert out.shape[1] == 84
    assert np.isfinite(out).all()
    # variable-Q: window lengths must be <= the constant-Q (gamma=0) lengths
    cqt_lengths = np.asarray(features.VQT(sr=22050, gamma=0, verbose=False)
                             .params["lenghts"])
    vqt_lengths = np.asarray(vqt.params["lenghts"])
    assert (vqt_lengths <= cqt_lengths).all()
    assert (vqt_lengths[0] < cqt_lengths[0])  # low bins shortened most


def test_vqt_output_formats():
    x = np.random.RandomState(2).randn(1, 22050).astype(np.float32)
    vqt = features.VQT(sr=22050, gamma=2, verbose=False)
    mag = np.asarray(vqt(x, output_format="Magnitude"))
    cplx = np.asarray(vqt(x, output_format="Complex"))
    ph = np.asarray(vqt(x, output_format="Phase"))
    assert cplx.shape == mag.shape + (2,)
    assert ph.shape == cplx.shape
    assert np.allclose(np.sqrt((cplx ** 2).sum(-1)), mag, rtol=1e-5, atol=1e-6)
    assert np.allclose((ph ** 2).sum(-1), 1.0, atol=1e-4)


def test_parallel_chain_matches_serial_vqt():
    """VQT rides the shared _pyramid_chain: the parallel composed-cascade
    chain must match the serial chain for gamma > 0 (per-octave banks)."""
    from nnaudio_tpu import set_use_parallel_chain

    x = np.random.RandomState(33).randn(1, 22050 * 2 + 321).astype(np.float32)
    layer = features.VQT(sr=22050, fmin=32.7, n_bins=84, bins_per_octave=12,
                         hop_length=512, gamma=6.0, verbose=False)
    want = np.asarray(layer(x))
    try:
        set_use_parallel_chain(True)
        got = np.asarray(layer(x))
    finally:
        set_use_parallel_chain(None)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5 * np.abs(want).max(),
                               rtol=1e-4)
