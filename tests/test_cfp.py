"""CFP correctness against an independent numpy fp64 oracle.

Includes the cutoff == N/2 edge (round-2 review): the reference's trailing
mask reaches bin N/2 there, which the half-spectrum chain must zero too.

The reference's frozen ``cfp_new.pt`` is a torch pickle of its own output;
instead of deserializing it we re-derive the CFP math end-to-end in numpy
(window, full-DFT magnitudes, alternating relu^g / real-FFT layers with index
cutoffs, triangular log-frequency projections) and require allclose.
"""
import numpy as np
import pytest

from nnaudio_tpu import features


def np_cfp_oracle(x, fr=2, fs=16000, hop=320, window_size=2049,
                  fc=80, tc=1 / 1000, g=(0.24, 0.6, 1), num_per_oct=48,
                  trim_edges=False):
    from scipy.signal.windows import blackmanharris

    N = int(fs / fr)
    h = blackmanharris(window_size)
    hp = np.zeros(N)
    lpad = (N - window_size) // 2
    hp[lpad : lpad + window_size] = h

    xp = np.pad(x.astype(np.float64), N // 2)
    T = (len(xp) - N) // hop + 1
    frames = np.stack([xp[t * hop : t * hop + N] for t in range(T)])
    X = np.fft.fft(frames * hp, axis=1)
    tfr0 = np.abs(X) / np.linalg.norm(h)
    if trim_edges:
        tfr0 = tfr0[1:-1]

    tc_idx, fc_idx = round(fs * tc), round(fc / fr)

    def nl(v, gg, cutoff):
        v = np.maximum(v, 0.0)
        v[:, :cutoff] = 0
        if cutoff > 0:
            v[:, -cutoff:] = 0
        return v ** gg

    spec = np.maximum(tfr0, 0.0) ** g[0]
    ceps = np.fft.fft(spec, axis=1).real / np.sqrt(N)
    ceps = nl(ceps, g[1], tc_idx)
    spec = np.fft.fft(ceps, axis=1).real / np.sqrt(N)
    spec = nl(spec, g[2], fc_idx)

    high_f = int(round((1 / tc) / fr) + 1)
    high_q = int(round(fs / fc) + 1)
    half = int(round(N / 2))
    tfr0c = tfr0[:, :half][:, :high_f]
    specc = spec[:, :half][:, :high_f]
    cepsc = ceps[:, :half][:, :high_q]

    f = fs * np.linspace(0, 0.5, N // 2, endpoint=True)[:high_f]
    q = np.arange(high_q) / float(fs)
    from nnaudio_tpu.filters.cfp import cfp_logfreq_matrices

    fm, qm = cfp_logfreq_matrices(f, q, fr, fc, tc, num_per_oct, fs)
    tfrL0 = fm @ tfr0c.T
    tfrLF = fm @ specc.T
    tfrLQ = qm @ cepsc.T
    return tfrLF * tfrLQ, tfrL0, tfrLF, tfrLQ


def test_cfp_vs_numpy_oracle():
    x = np.random.RandomState(0).randn(16000).astype(np.float32)
    layer = features.CFP()
    Z = np.asarray(layer(x[None]))[0]
    Z_ref, _, _, _ = np_cfp_oracle(x)
    assert Z.shape == Z_ref.shape
    assert np.allclose(Z, Z_ref, rtol=1e-2, atol=1e-4), np.abs(Z - Z_ref).max()


def test_combined_frequency_periodicity_vs_oracle():
    x = np.random.RandomState(1).randn(16000).astype(np.float32)
    layer = features.Combined_Frequency_Periodicity()
    Z, L0, LF, LQ = layer(x[None])
    Z_ref, L0_ref, LF_ref, LQ_ref = np_cfp_oracle(x, trim_edges=True)
    assert np.allclose(np.asarray(L0)[0], L0_ref, rtol=1e-2, atol=1e-4)
    assert np.allclose(np.asarray(LF)[0], LF_ref, rtol=1e-2, atol=1e-4)
    assert np.allclose(np.asarray(LQ)[0], LQ_ref, rtol=1e-2, atol=1e-4)
    assert np.allclose(np.asarray(Z)[0], Z_ref, rtol=1e-2, atol=1e-4)


def test_cfp_cutoff_mask_half_spectrum_semantics():
    """The half-spectrum cutoff mask must replicate the reference's exact
    membership (zero m < c OR m >= N - c) — including the edge c == N/2
    where the trailing range reaches bin N/2 itself (round-2 review
    finding; unreachable through the public fc/tc surface, which constrains
    cutoffs away from Nyquist, but the helper must stay exact)."""
    layer = features.CFP()
    N, half = layer.N, layer.half
    v = np.ones((1, 1, half), np.float32)
    for c in (0, 1, 16, N // 4, N // 2 - 1, N // 2):
        out = np.asarray(layer._nonlinear(v, 1.0, c))[0, 0]
        full_mask = np.ones(N)
        if c > 0:
            full_mask[:c] = 0
            full_mask[-c:] = 0
        assert np.array_equal(out, full_mask[:half].astype(np.float32)), c


def test_cfp_timestep_alignment():
    """CFP keeps all frames; Combined_Frequency_Periodicity trims 2."""
    x = np.random.RandomState(2).randn(1, 16000).astype(np.float32)
    z_new = np.asarray(features.CFP()(x))
    z_orig, *_ = features.Combined_Frequency_Periodicity()(x)
    assert z_new.shape[-1] == np.asarray(z_orig).shape[-1] + 2
