"""Core ops: framing, overlap-add, dispatch paths, Pallas kernel (interpreted).

The Pallas fused frame+matmul kernel is validated in interpreter mode on CPU
against the XLA path (SURVEY.md §7 step 8: "validate against the XLA path").
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nnaudio_tpu.core.frame import frame_signal, frames_to_signal, num_frames
from nnaudio_tpu.core.overlap import extend_fbins, window_sumsquare
from nnaudio_tpu.ops import dispatch
from nnaudio_tpu.ops import framed_matmul


def test_frame_signal_matches_loop():
    x = np.arange(32, dtype=np.float32)[None]
    frames = np.asarray(frame_signal(jnp.asarray(x), 8, 4))
    assert frames.shape == (1, 7, 8)
    for t in range(7):
        assert np.array_equal(frames[0, t], x[0, t * 4 : t * 4 + 8])


@pytest.mark.parametrize("L,W,hop", [
    (1000, 256, 64),   # q=4
    (1000, 256, 8),    # q=32 (deep-pyramid hop)
    (500, 509, 256),   # decimation-chain shape (q=2, odd width)
    (300, 100, 100),   # q=1, hop == W
    (300, 100, 150),   # hop > W (gapped frames)
    (100, 7, 3),       # tiny odd sizes
    (64, 64, 1),       # pathological overlap (q=64, slice path)
    (400, 130, 1),     # q=130 > 128: gather fallback branch
])
def test_frame_signal_slice_phases_match_gather(L, W, hop):
    """The round-5 slice/reshape framing is bit-identical to the gather
    it replaced, and its VJP is the same overlap-add scatter."""
    rng = np.random.RandomState(0)
    x = rng.randn(3, L).astype(np.float32)
    t = num_frames(L, W, hop)
    if t <= 0:
        pytest.skip("no frames at this geometry")
    got = np.asarray(frame_signal(jnp.asarray(x), W, hop))
    idx = np.arange(t)[:, None] * hop + np.arange(W)[None, :]
    want = x[:, idx]
    assert got.shape == want.shape
    assert np.array_equal(got, want)

    def f(xx):
        return jnp.sum(jnp.sin(frame_signal(xx, W, hop)))

    g = np.asarray(jax.grad(f)(jnp.asarray(x)))
    gw = np.zeros_like(x)
    np.add.at(gw, (np.arange(3)[:, None, None], idx[None]), np.cos(want))
    assert np.allclose(g, gw, atol=1e-5)


def test_frames_to_signal_is_adjoint():
    """<frame(x), F> == <x, frames_to_signal(F)> for random tensors."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64).astype(np.float32))
    F = jnp.asarray(rng.randn(2, 15, 8).astype(np.float32))
    lhs = jnp.vdot(frame_signal(x, 8, 4), F)
    rhs = jnp.vdot(x, frames_to_signal(F, 4, 64))
    assert np.allclose(lhs, rhs, rtol=1e-5)


def test_window_sumsquare_matches_loop():
    w = jnp.asarray(np.hanning(16).astype(np.float32))
    got = np.asarray(window_sumsquare(w, 5, 4, 16))
    want = np.zeros(16 + 4 * 4)
    for t in range(5):
        want[t * 4 : t * 4 + 16] += np.asarray(w) ** 2
    assert np.allclose(got, want, atol=1e-6)


def test_extend_fbins_symmetry():
    rng = np.random.RandomState(1)
    X = jnp.asarray(rng.randn(1, 9, 4, 2).astype(np.float32))  # n_fft=16
    full = np.asarray(extend_fbins(X))
    assert full.shape == (1, 16, 4, 2)
    for k in range(1, 8):
        assert np.allclose(full[:, 16 - k, :, 0], full[:, k, :, 0])
        assert np.allclose(full[:, 16 - k, :, 1], -full[:, k, :, 1])


@pytest.mark.parametrize("n_fft,hop,length", [(256, 64, 2048), (512, 128, 4096),
                                              (384, 96, 2000)])
def test_xla_pair_matches_gather_path(n_fft, hop, length):
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, length).astype(np.float32))
    w1 = jnp.asarray(rng.randn(65, n_fft).astype(np.float32))
    w2 = jnp.asarray(rng.randn(65, n_fft).astype(np.float32))
    real, imag = dispatch._xla_pair(x, w1, w2, hop)
    from nnaudio_tpu.core.apply import apply_basis

    frames = frame_signal(x, n_fft, hop)
    want_r, want_i = apply_basis(frames, w1), apply_basis(frames, w2)
    assert np.allclose(real, want_r, rtol=1e-4, atol=1e-4)
    assert np.allclose(imag, want_i, rtol=1e-4, atol=1e-4)


def test_pallas_kernel_interpreted_matches_xla():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 4096).astype(np.float32))
    wcos = jnp.asarray(rng.randn(129, 1024).astype(np.float32))
    wsin = jnp.asarray(rng.randn(129, 1024).astype(np.float32))
    hop = 256
    assert framed_matmul.framed_matmul_pair_supported(x, wcos, hop)
    framed_matmul._INTERPRET = True
    try:
        real_p, imag_p = framed_matmul.framed_matmul_pair_pallas(x, wcos, wsin, hop)
    finally:
        framed_matmul._INTERPRET = False
    real_x, imag_x = dispatch._xla_pair(x, wcos, wsin, hop)
    # accumulation-order noise over 1024-long fp32 dots: ~1e-6 relative
    assert np.allclose(real_p, real_x, rtol=1e-4, atol=1e-4)
    assert np.allclose(imag_p, imag_x, rtol=1e-4, atol=1e-4)


def test_framed_basis_pair_custom_vjp():
    """Gradient of the custom-VJP op matches autodiff through the gather path."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 512).astype(np.float32))
    wcos = jnp.asarray(rng.randn(17, 64).astype(np.float32))
    wsin = jnp.asarray(rng.randn(17, 64).astype(np.float32))

    def loss_custom(x, wc, ws):
        r, i = dispatch.framed_basis_pair(x, wc, ws, 16)
        return jnp.sum(r ** 2) + jnp.sum(i ** 2)

    def loss_ref(x, wc, ws):
        from nnaudio_tpu.core.apply import apply_basis

        frames = frame_signal(x, 64, 16)
        r, i = apply_basis(frames, wc), apply_basis(frames, ws)
        return jnp.sum(r ** 2) + jnp.sum(i ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(x, wcos, wsin)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wcos, wsin)
    for a, b in zip(g1, g2):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pallas_fused_magnitude_interpreted():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 4096).astype(np.float32))
    wcos = jnp.asarray(rng.randn(129, 1024).astype(np.float32))
    wsin = jnp.asarray(rng.randn(129, 1024).astype(np.float32))
    hop = 256
    framed_matmul._INTERPRET = True
    try:
        mag = framed_matmul.framed_magnitude_pallas(x, wcos, wsin, hop,
                                                    highest=True)
        mag_eps = framed_matmul.framed_magnitude_pallas(x, wcos, wsin, hop,
                                                        highest=True, eps=1e-8)
    finally:
        framed_matmul._INTERPRET = False
    real, imag = dispatch._xla_pair(x, wcos, wsin, hop)
    want = jnp.sqrt(real ** 2 + imag ** 2)
    assert np.allclose(mag, want, rtol=1e-4, atol=1e-4)
    assert np.allclose(mag_eps, jnp.sqrt(real ** 2 + imag ** 2 + 1e-8),
                       rtol=1e-4, atol=1e-4)


def test_framed_magnitude_custom_vjp():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 512).astype(np.float32))
    wcos = jnp.asarray(rng.randn(17, 64).astype(np.float32))
    wsin = jnp.asarray(rng.randn(17, 64).astype(np.float32))

    def loss_fused(x, wc, ws):
        return jnp.sum(dispatch.framed_magnitude(x, wc, ws, 16, 1e-8) ** 2)

    def loss_ref(x, wc, ws):
        r, i = dispatch._xla_pair(x, wc, ws, 16)
        return jnp.sum((r * r + i * i + 1e-8))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, wcos, wsin)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wcos, wsin)
    # d/dθ sum(mag^2) == d/dθ sum(r^2+i^2+eps): identical gradients
    for a, b in zip(g1, g2):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pallas_synthesis_ola_interpreted():
    """The (off-by-default) fused synthesis+OLA kernel matches the XLA path."""
    from nnaudio_tpu.filters.fourier import create_fourier_basis
    from nnaudio_tpu.features.stft import hermitian_weights

    n_fft, hop, F, B, T = 512, 128, 257, 2, 21
    basis = create_fourier_basis(n_fft, window="hann")
    wt = np.asarray(hermitian_weights(n_fft, F))
    w = np.asarray(basis.window_mask)
    kc = jnp.asarray(basis.wcos * wt[:, None] * w[None, :] / n_fft)
    ks = jnp.asarray(basis.wsin * wt[:, None] * w[None, :] / n_fft)
    rng = np.random.RandomState(1)
    sre = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    sim = jnp.asarray(rng.randn(B, F, T).astype(np.float32))

    framed_matmul._INTERPRET = True
    try:
        got = framed_matmul.synthesis_ola_pallas(sre, sim, kc, ks, hop,
                                                 highest=True)
        got_fast = framed_matmul.synthesis_ola_pallas(sre, sim, kc, ks, hop,
                                                      highest=False)
    finally:
        framed_matmul._INTERPRET = False
    HI = jax.lax.Precision.HIGHEST
    frames = (jnp.einsum("fj,bft->btj", kc, sre, precision=HI)
              - jnp.einsum("fj,bft->btj", ks, sim, precision=HI))
    want = frames_to_signal(frames, hop, n_fft + hop * (T - 1))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-5)
    # bf16 storage: coarser but bounded
    assert np.allclose(got_fast, want, rtol=5e-2,
                       atol=5e-2 * float(jnp.abs(want).max()))


def test_pallas_synthesis_unaligned_hop_gate():
    """Hops with lcm(hop, 128)/hop > 8 (e.g. 100 -> q=32) stay outside the
    fused envelope: the dispatcher must return None (XLA fallback), not
    crash at trace."""
    rng = np.random.RandomState(20)
    sre = jnp.asarray(rng.randn(8, 1025, 200).astype(np.float32))
    sim = jnp.asarray(rng.randn(8, 1025, 200).astype(np.float32))
    kc = jnp.asarray(rng.randn(1025, 2048).astype(np.float32))
    ks = jnp.asarray(rng.randn(1025, 2048).astype(np.float32))
    assert framed_matmul.synthesis_ola_pallas(sre, sim, kc, ks, 100,
                                              highest=True) is None


def test_pallas_synthesis_sixteen_chunks_interpreted():
    """hop=128 / n_fft=2048 (16 chunks, 15 boundary rows) — outside the old
    n_chunks <= 9 envelope, fused since round 3 via the widened tail
    block."""
    from nnaudio_tpu.core.frame import frames_to_signal as f2s

    n_fft, hop, F, B, T = 2048, 128, 129, 1, 140
    rng = np.random.RandomState(22)
    sre = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    sim = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    kc = jnp.asarray(rng.randn(F, n_fft).astype(np.float32) * 0.01)
    ks = jnp.asarray(rng.randn(F, n_fft).astype(np.float32) * 0.01)
    framed_matmul._INTERPRET = True
    try:
        got = framed_matmul.synthesis_ola_pallas(sre, sim, kc, ks, hop,
                                                 highest=True)
    finally:
        framed_matmul._INTERPRET = False
    assert got is not None
    HI = jax.lax.Precision.HIGHEST
    frames = (jnp.einsum("fj,bft->btj", kc, sre, precision=HI)
              - jnp.einsum("fj,bft->btj", ks, sim, precision=HI))
    want = f2s(frames, hop, n_fft + hop * (T - 1))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), np.abs(got - want).max()


@pytest.mark.parametrize("n_fft,hop", [(512, 160), (2048, 320), (400, 160)])
def test_pallas_synthesis_generalized_hop_interpreted(n_fft, hop):
    """Speech hops (lcm-repack, q > 1) — incl. n_fft % hop != 0 (400/160):
    the q overlapping row phases must recombine exactly (round-3 port of
    the analysis envelope, VERDICT item 3)."""
    from nnaudio_tpu.core.frame import frames_to_signal as f2s

    F, B, T = n_fft // 2 + 1, 2, 90
    rng = np.random.RandomState(23)
    sre = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    sim = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    kc = jnp.asarray(rng.randn(F, n_fft).astype(np.float32) * 0.01)
    ks = jnp.asarray(rng.randn(F, n_fft).astype(np.float32) * 0.01)
    framed_matmul._INTERPRET = True
    try:
        got = framed_matmul.synthesis_ola_pallas(sre, sim, kc, ks, hop,
                                                 highest=True)
        got_fast = framed_matmul.synthesis_ola_pallas(sre, sim, kc, ks, hop,
                                                      highest=False)
    finally:
        framed_matmul._INTERPRET = False
    assert got is not None
    HI = jax.lax.Precision.HIGHEST
    frames = (jnp.einsum("fj,bft->btj", kc, sre, precision=HI)
              - jnp.einsum("fj,bft->btj", ks, sim, precision=HI))
    want = f2s(frames, hop, n_fft + hop * (T - 1))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), np.abs(got - want).max()
    if got_fast is not None:
        assert np.allclose(got_fast, want, rtol=5e-2,
                           atol=5e-2 * float(jnp.abs(want).max()))


def test_pallas_synthesis_nine_chunks_interpreted():
    """The largest in-envelope overlap (n_chunks=9... nearest valid: 8 with
    hop=128/n_fft=1024): multi-tile tail folding across row-tile boundaries."""
    from nnaudio_tpu.core.frame import frames_to_signal as f2s

    n_fft, hop, F, B, T = 1024, 128, 513, 2, 300
    rng = np.random.RandomState(21)
    sre = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    sim = jnp.asarray(rng.randn(B, F, T).astype(np.float32))
    kc = jnp.asarray(rng.randn(F, n_fft).astype(np.float32) * 0.01)
    ks = jnp.asarray(rng.randn(F, n_fft).astype(np.float32) * 0.01)
    framed_matmul._INTERPRET = True
    try:
        got = framed_matmul.synthesis_ola_pallas(sre, sim, kc, ks, hop,
                                                 highest=True)
    finally:
        framed_matmul._INTERPRET = False
    assert got is not None
    HI = jax.lax.Precision.HIGHEST
    frames = (jnp.einsum("fj,bft->btj", kc, sre, precision=HI)
              - jnp.einsum("fj,bft->btj", ks, sim, precision=HI))
    want = f2s(frames, hop, n_fft + hop * (T - 1))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), np.abs(got - want).max()


def test_synthesis_ola_custom_vjp():
    from nnaudio_tpu.filters.fourier import create_fourier_basis

    n_fft, hop, F, T = 64, 16, 33, 5
    basis = create_fourier_basis(n_fft, window="hann")
    kc = jnp.asarray(basis.wcos / n_fft)
    ks = jnp.asarray(basis.wsin / n_fft)
    rng = np.random.RandomState(2)
    sre = jnp.asarray(rng.randn(1, F, T).astype(np.float32))
    sim = jnp.asarray(rng.randn(1, F, T).astype(np.float32))

    def loss_custom(sre, sim, kc, ks):
        return jnp.sum(dispatch.synthesis_ola(sre, sim, kc, ks, hop) ** 2)

    def loss_ref(sre, sim, kc, ks):
        HI = jax.lax.Precision.HIGHEST
        frames = (jnp.einsum("fj,bft->btj", kc, sre, precision=HI)
                  - jnp.einsum("fj,bft->btj", ks, sim, precision=HI))
        return jnp.sum(frames_to_signal(frames, hop, n_fft + hop * (T - 1)) ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(sre, sim, kc, ks)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(sre, sim, kc, ks)
    for a, b in zip(g1, g2):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-5)


def test_pallas_fused_filterbank_interpreted():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 4096).astype(np.float32))
    wcos = jnp.asarray(rng.randn(129, 1024).astype(np.float32))
    wsin = jnp.asarray(rng.randn(129, 1024).astype(np.float32))
    fb = jnp.asarray(np.abs(rng.randn(48, 129)).astype(np.float32))
    hop = 256
    framed_matmul._INTERPRET = True
    try:
        got = framed_matmul.framed_filterbank_pallas(x, wcos, wsin, fb, hop,
                                                     highest=True)
        got_eps = framed_matmul.framed_filterbank_pallas(x, wcos, wsin, fb,
                                                         hop, highest=True,
                                                         eps=1e-8)
    finally:
        framed_matmul._INTERPRET = False
    real, imag = dispatch._xla_pair(x, wcos, wsin, hop)
    power = real ** 2 + imag ** 2
    want = jnp.einsum("gf,bft->bgt", fb, power,
                      precision=jax.lax.Precision.HIGHEST)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-3), np.abs(got-want).max()
    want_eps = jnp.einsum("gf,bft->bgt", fb, power + 1e-8,
                          precision=jax.lax.Precision.HIGHEST)
    assert np.allclose(got_eps, want_eps, rtol=1e-4, atol=1e-3)


def test_framed_filterbank_custom_vjp():
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 512).astype(np.float32))
    wcos = jnp.asarray(rng.randn(17, 64).astype(np.float32))
    wsin = jnp.asarray(rng.randn(17, 64).astype(np.float32))
    fb = jnp.asarray(np.abs(rng.randn(6, 17)).astype(np.float32))

    def loss_fused(x, wc, ws, f):
        return jnp.sum(dispatch.framed_filterbank(x, wc, ws, f, 16, 1e-8) ** 2)

    def loss_ref(x, wc, ws, f):
        r, i = dispatch._xla_pair(x, wc, ws, 16)
        return jnp.sum(jnp.einsum("gf,bft->bgt", f, r * r + i * i + 1e-8,
                                  precision=jax.lax.Precision.HIGHEST) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, wcos, wsin, fb)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wcos, wsin, fb)
    for a, b in zip(g1, g2):
        # hop=16 < 128 routes the ref arm's pair through the frame path
        # (round 5) while the custom VJP keeps the chunked dW einsums —
        # the arms now differ by fp32 reassociation, so the tolerance is
        # scale-relative instead of the old shared-forward bitwise one.
        assert np.allclose(a, b, rtol=1e-4, atol=1e-5 * np.abs(b).max())


@pytest.mark.parametrize("n_fft,hop", [
    (512, 160),    # speech hop: w=lcm(160,128)=640, q=4, n_fft % hop != 0
    (2048, 320),   # CFP-style hop: q=2
    (256, 64),     # CQT-pyramid lower octave: q=2
    (384, 96),     # q=4, n_fft % w != 0 (basis column padding)
])
def test_pallas_generalized_hop_interpreted(n_fft, hop):
    """The fused kernels cover hops outside hop % 128 == 0 via the
    w=lcm(hop,128) row repack (VERDICT round-1 item 3)."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 6400).astype(np.float32))
    wcos = jnp.asarray(rng.randn(65, n_fft).astype(np.float32))
    wsin = jnp.asarray(rng.randn(65, n_fft).astype(np.float32))
    fb = jnp.asarray(np.abs(rng.randn(24, 65)).astype(np.float32))
    assert framed_matmul.framed_matmul_pair_supported(x, wcos, hop)
    framed_matmul._INTERPRET = True
    try:
        mag = framed_matmul.framed_magnitude_pallas(x, wcos, wsin, hop,
                                                    highest=True)
        real_p, imag_p = framed_matmul.framed_matmul_pair_pallas(
            x, wcos, wsin, hop)
        melp = framed_matmul.framed_filterbank_pallas(x, wcos, wsin, fb, hop,
                                                      highest=True)
    finally:
        framed_matmul._INTERPRET = False
    real, imag = dispatch._xla_pair(x, wcos, wsin, hop)
    want = jnp.sqrt(real ** 2 + imag ** 2)
    assert np.allclose(mag, want, rtol=1e-4, atol=1e-4)
    assert np.allclose(real_p, real, rtol=1e-4, atol=1e-4)
    assert np.allclose(imag_p, imag, rtol=1e-4, atol=1e-4)
    want_fb = jnp.einsum("gf,bft->bgt", fb, real ** 2 + imag ** 2,
                         precision=jax.lax.Precision.HIGHEST)
    assert np.allclose(melp, want_fb, rtol=1e-4, atol=1e-3)


def test_pallas_envelope_gate():
    """Hops whose lcm with 128 explodes the repack stay on the XLA path."""
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 4096).astype(np.float32))
    wcos = jnp.asarray(rng.randn(65, 512).astype(np.float32))
    assert not framed_matmul.framed_matmul_pair_supported(x, wcos, 100)  # q=32
    assert not framed_matmul.framed_matmul_pair_supported(x, wcos, 7)
    assert framed_matmul.framed_matmul_pair_supported(x, wcos, 160)


def test_backward_hopdec_with_tail_samples():
    """Backward hop-decomposition path: signals with samples beyond the last
    frame must get zero gradient there and match the gather-path autodiff."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 530).astype(np.float32))  # 18 tail samples
    wcos = jnp.asarray(rng.randn(17, 64).astype(np.float32))
    wsin = jnp.asarray(rng.randn(17, 64).astype(np.float32))

    def loss_custom(x, wc, ws):
        r, i = dispatch.framed_basis_pair(x, wc, ws, 16)
        return jnp.sum(jnp.sin(r)) + jnp.sum(i ** 2)

    def loss_ref(x, wc, ws):
        from nnaudio_tpu.core.apply import apply_basis

        frames = frame_signal(x, 64, 16)
        r, i = apply_basis(frames, wc), apply_basis(frames, ws)
        return jnp.sum(jnp.sin(r)) + jnp.sum(i ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2))(x, wcos, wsin)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, wcos, wsin)
    for a, b in zip(g1, g2):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-4)
    # tail samples past the last frame: zero gradient
    assert np.array_equal(np.asarray(g1[0][:, -2:]), np.zeros((2, 2)))


def test_framed_complex_matches_pair_stack():
    """framed_complex == stack((real*s, -imag*s)) of the pair — the op is a
    convention wrapper over the XLA pair (the fused stack is free: see the
    round-3 measured note in ops/framed_matmul.py)."""
    rng = np.random.RandomState(31)
    x = jnp.asarray(rng.randn(2, 4096).astype(np.float32))
    wcos = jnp.asarray(rng.randn(129, 1024).astype(np.float32))
    wsin = jnp.asarray(rng.randn(129, 1024).astype(np.float32))
    scale = jnp.asarray(rng.rand(129).astype(np.float32) + 0.5)
    hop = 256
    real, imag = dispatch._xla_pair(x, wcos, wsin, hop)
    out = dispatch.framed_complex(x, wcos, wsin, None, hop)
    assert np.allclose(out, jnp.stack((real, -imag), -1), rtol=1e-5,
                       atol=1e-6)
    out_s = dispatch.framed_complex(x, wcos, wsin, scale, hop)
    want_s = jnp.stack((real * scale[None, :, None],
                        -imag * scale[None, :, None]), -1)
    assert np.allclose(out_s, want_s, rtol=1e-5, atol=1e-6)


def test_framed_complex_custom_vjp():
    """framed_complex gradients (incl. the scale cotangent) match autodiff
    through the unfused stack."""
    rng = np.random.RandomState(33)
    x = jnp.asarray(rng.randn(1, 512).astype(np.float32))
    wcos = jnp.asarray(rng.randn(17, 64).astype(np.float32))
    wsin = jnp.asarray(rng.randn(17, 64).astype(np.float32))
    scale = jnp.asarray(rng.rand(17).astype(np.float32) + 0.5)
    tgt = jnp.asarray(rng.randn(1, 17, 29, 2).astype(np.float32))

    def loss_custom(x, wc, ws, s):
        out = dispatch.framed_complex(x, wc, ws, s, 16)
        return jnp.sum((out - tgt) ** 2)

    def loss_ref(x, wc, ws, s):
        from nnaudio_tpu.core.apply import apply_basis

        frames = frame_signal(x, 64, 16)
        r, i = apply_basis(frames, wc), apply_basis(frames, ws)
        out = jnp.stack((r * s[None, :, None], -i * s[None, :, None]), -1)
        return jnp.sum((out - tgt) ** 2)

    g1 = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(x, wcos, wsin, scale)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wcos, wsin, scale)
    for a, b in zip(g1, g2):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-4)


def test_pallas_kchunk_magnitude_interpreted():
    """The K-chunked giant-bank kernel (single F tile, basis streamed over
    the grid's inner axis) matches the XLA pair — exercised directly since
    the whole-K plan would accept these small shapes."""
    rng = np.random.RandomState(40)
    x = jnp.asarray(rng.randn(2, 16384).astype(np.float32))
    wcos = jnp.asarray((rng.randn(84, 8192) * 0.05).astype(np.float32))
    wsin = jnp.asarray((rng.randn(84, 8192) * 0.05).astype(np.float32))
    hop = 512
    plan = framed_matmul._plan_kchunk(2, 8192, 84, (16384 - 8192) // hop + 1,
                                      hop, True)
    assert plan is not None and plan["nk"] > 1  # truly multi-k-step
    framed_matmul._INTERPRET = True
    try:
        got = framed_matmul._framed_magnitude_kchunk(
            x, jnp.asarray(wcos).T, jnp.asarray(wsin).T, hop, highest=True,
            **plan)
        got_sq = framed_matmul._framed_magnitude_kchunk(
            x, jnp.asarray(wcos).T, jnp.asarray(wsin).T, hop, highest=True,
            square=True, eps=1e-8, **plan)
    finally:
        framed_matmul._INTERPRET = False
    real, imag = dispatch._xla_pair(x, wcos, wsin, hop)
    want = jnp.sqrt(real ** 2 + imag ** 2)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), np.abs(got - want).max()
    assert np.allclose(got_sq, real ** 2 + imag ** 2 + 1e-8, rtol=1e-4,
                       atol=1e-4)


def test_pallas_kchunk_generalized_hop_interpreted():
    """K-chunked variant with a q>1 hop (repacked slab rows, dynamic chunk
    offsets c*q)."""
    rng = np.random.RandomState(41)
    hop, n_fft = 320, 4096
    x = jnp.asarray(rng.randn(1, 12000).astype(np.float32))
    wcos = jnp.asarray((rng.randn(64, n_fft) * 0.05).astype(np.float32))
    wsin = jnp.asarray((rng.randn(64, n_fft) * 0.05).astype(np.float32))
    t_total = (12000 - n_fft) // hop + 1
    plan = framed_matmul._plan_kchunk(1, n_fft, 64, t_total, hop, True)
    assert plan is not None and plan["q"] > 1
    framed_matmul._INTERPRET = True
    try:
        got = framed_matmul._framed_magnitude_kchunk(
            x, jnp.asarray(wcos).T, jnp.asarray(wsin).T, hop, highest=True,
            **plan)
    finally:
        framed_matmul._INTERPRET = False
    real, imag = dispatch._xla_pair(x, wcos, wsin, hop)
    want = jnp.sqrt(real ** 2 + imag ** 2)
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), np.abs(got - want).max()


def test_pallas_gl_step_interpreted():
    """Fused Griffin-Lim step == pair + momentum + normalize + S-scale."""
    rng = np.random.RandomState(50)
    b, n_fft, hop, L = 2, 512, 128, 8192
    f = n_fft // 2 + 1
    x = jnp.asarray(rng.randn(b, L).astype(np.float32))
    wcos = jnp.asarray(rng.randn(f, n_fft).astype(np.float32) * 0.05)
    wsin = jnp.asarray(rng.randn(f, n_fft).astype(np.float32) * 0.05)
    plan = framed_matmul.gl_step_plan(b, L, f, n_fft, hop)
    assert plan is not None
    fp, tp = plan["f_padded"], plan["t_padded"]
    t = (L - n_fft) // hop + 1
    S = jnp.asarray(np.abs(rng.randn(b, fp, tp)).astype(np.float32))
    S = S.at[:, f:, :].set(0.0).at[:, :, t:].set(0.0)
    p_re = jnp.asarray(rng.randn(b, fp, tp).astype(np.float32)).astype(jnp.bfloat16)
    p_im = jnp.asarray(rng.randn(b, fp, tp).astype(np.float32)).astype(jnp.bfloat16)
    mom = 0.99 / 1.99
    static_plan = {k: plan[k] for k in ("w", "q", "n_chunks", "tile_t",
                                        "tile_f", "bb", "slab_rows",
                                        "t_padded", "f_padded")}
    framed_matmul._INTERPRET = True
    try:
        c_re, c_im, r_re, r_im = framed_matmul._framed_gl_step(
            x, wcos.T, wsin.T, S, p_re, p_im, hop, mom=mom, **static_plan)
    finally:
        framed_matmul._INTERPRET = False

    real, imag = dispatch._xla_pair(x, wcos, wsin, hop)
    w_rre, w_rim = real, -imag
    n_re = w_rre - mom * np.asarray(p_re[:, :f, :t], np.float32)
    n_im = w_rim - mom * np.asarray(p_im[:, :f, :t], np.float32)
    scale = np.asarray(S[:, :f, :t]) / np.sqrt(n_re**2 + n_im**2 + 1e-32)
    tol = dict(rtol=2e-2, atol=2e-2)  # bf16 outputs vs fp32 chain
    assert np.allclose(np.asarray(c_re[:, :f, :t], np.float32),
                       n_re * scale, **tol)
    assert np.allclose(np.asarray(c_im[:, :f, :t], np.float32),
                       n_im * scale, **tol)
    assert np.allclose(np.asarray(r_re[:, :f, :t], np.float32), w_rre, **tol)
    assert np.allclose(np.asarray(r_im[:, :f, :t], np.float32), w_rim, **tol)
    # padded region carries must be exactly zero (S pad = 0)
    assert not np.isnan(np.asarray(c_re, np.float32)).any()
    assert (np.asarray(c_re[:, f:, :], np.float32) == 0).all()
    assert (np.asarray(c_re[:, :, t:], np.float32) == 0).all()


@pytest.mark.parametrize("center", [True, False])
def test_gl_fused_forward_interpreted_matches_xla_path(center):
    """Whole fused GL loop (interpret mode) lands at the same spectral
    error as the XLA-chain loop, centered and not."""
    from nnaudio_tpu import features

    sr, n_fft, hop = 16000, 512, 128
    tt = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * tt).astype(np.float32)
    stft = features.STFT(n_fft=n_fft, hop_length=hop, center=center,
                         output_format="Magnitude", verbose=False)
    S = stft(x[None])
    gl = features.Griffin_Lim(n_fft=n_fft, hop_length=hop, n_iter=16,
                              center=center)
    p = {k: jnp.asarray(v) for k, v in gl._params.items()}
    key = jax.random.PRNGKey(3)
    rec_xla = np.asarray(jax.jit(gl._forward)(p, jnp.asarray(S), key))[0]

    b, f, t = S.shape
    plan = framed_matmul.gl_step_plan(b, n_fft + hop * (t - 1), f, n_fft, hop)
    assert plan is not None
    rand_phase = jax.random.normal(key, (b, f, t))
    mom = gl.momentum / (1 + gl.momentum)
    framed_matmul._INTERPRET = True
    try:
        rec_fused = np.asarray(jax.jit(
            lambda pp, SS, rp: gl._forward_fused(pp, SS, rp, mom, plan)
        )(p, jnp.asarray(S), rand_phase))[0]
    finally:
        framed_matmul._INTERPRET = False

    def spec_err(rec):
        S_rec = np.asarray(stft(rec[None]))[0]
        S_in = np.asarray(S)[0][:, : S_rec.shape[1]]
        return (np.linalg.norm(S_rec[:, : S_in.shape[1]] - S_in)
                / np.linalg.norm(S_in))

    e_xla, e_fused = spec_err(rec_xla), spec_err(rec_fused)
    assert e_fused < 0.25, (e_fused, e_xla)
    assert abs(e_fused - e_xla) < 0.05, (e_fused, e_xla)


@pytest.mark.parametrize("center", [True, False])
def test_gl_fused_loop_is_same_fixed_point_map(center):
    """Round-3c regression: the fused loop must be the SAME fixed-point map
    as the XLA loop up to matmul rounding — including the last n_fft
    samples. The two bugs this pins down both concentrated in the tail:
    (a) a t_padded-frame window-sumsquare envelope attenuated the real
    tail (phantom frames overlap it when hop < n_fft); (b) the center
    trim/re-pad ran at the padded length, keeping pad_amount extra real
    samples and dropping the right reflect pad."""
    from nnaudio_tpu import features

    sr, n_fft, hop = 16000, 512, 128
    tt = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * tt).astype(np.float32)
    stft = features.STFT(n_fft=n_fft, hop_length=hop, center=center,
                         output_format="Magnitude", verbose=False)
    S = stft(x[None])
    gl = features.Griffin_Lim(n_fft=n_fft, hop_length=hop, n_iter=2,
                              center=center)
    p = {k: jnp.asarray(v) for k, v in gl._params.items()}
    key = jax.random.PRNGKey(7)
    rec_xla = np.asarray(jax.jit(gl._forward)(p, jnp.asarray(S), key))[0]

    b, f, t = S.shape
    plan = framed_matmul.gl_step_plan(b, n_fft + hop * (t - 1), f, n_fft, hop)
    assert plan is not None and plan["t_padded"] > t  # phantom frames exist
    rand_phase = jax.random.normal(key, (b, f, t))
    mom = gl.momentum / (1 + gl.momentum)
    framed_matmul._INTERPRET = True
    try:
        rec_fused = np.asarray(jax.jit(
            lambda pp, SS, rp: gl._forward_fused(pp, SS, rp, mom, plan)
        )(p, jnp.asarray(S), rand_phase))[0]
    finally:
        framed_matmul._INTERPRET = False

    assert rec_fused.shape == rec_xla.shape
    scale = np.abs(rec_xla).max()
    err_all = np.abs(rec_fused - rec_xla).max() / scale
    err_tail = np.abs(rec_fused[-n_fft:] - rec_xla[-n_fft:]).max() / scale
    assert err_all < 3e-2, err_all
    assert err_tail < 3e-2, err_tail


def test_gl_fused_loop_highest_matches_xla_path():
    """The fp32 variant of the fused GL step (iter_precision='highest':
    fp32 carries + chunked-K HIGHEST dots — round-4 VERDICT item 6) must be
    the same fixed-point map as the XLA fp32 loop to fp32-rounding
    tightness, far tighter than the bf16 variant's 3e-2."""
    from nnaudio_tpu import features

    sr, n_fft, hop = 16000, 512, 128
    tt = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 440 * tt).astype(np.float32)
    stft = features.STFT(n_fft=n_fft, hop_length=hop, center=True,
                         output_format="Magnitude", verbose=False)
    S = stft(x[None])
    gl = features.Griffin_Lim(n_fft=n_fft, hop_length=hop, n_iter=2,
                              center=True, iter_precision="highest")
    p = {k: jnp.asarray(v) for k, v in gl._params.items()}
    key = jax.random.PRNGKey(9)
    rec_xla = np.asarray(jax.jit(gl._forward)(p, jnp.asarray(S), key))[0]

    b, f, t = S.shape
    plan = framed_matmul.gl_step_plan(b, n_fft + hop * (t - 1), f, n_fft,
                                      hop, highest=True)
    assert plan is not None
    rand_phase = jax.random.normal(key, (b, f, t))
    mom = gl.momentum / (1 + gl.momentum)
    framed_matmul._INTERPRET = True
    try:
        rec_fused = np.asarray(jax.jit(
            lambda pp, SS, rp: gl._forward_fused(pp, SS, rp, mom, plan)
        )(p, jnp.asarray(S), rand_phase))[0]
    finally:
        framed_matmul._INTERPRET = False

    assert rec_fused.shape == rec_xla.shape
    scale = np.abs(rec_xla).max()
    err = np.abs(rec_fused - rec_xla).max() / scale
    assert err < 5e-4, err


def test_synthesis_auto_fuse_policy():
    """The measured round-3 dispatch policy: fast always fuses; fp32 modes
    fuse exactly where XLA's scatter-OLA collapses (q > 1 or > 9 chunks)."""
    pol = dispatch.synthesis_auto_fuse
    assert pol(512, 2048, "default") is True
    assert pol(512, 2048, "highest") is False        # aligned headline: XLA
    assert pol(160, 512, "highest") is True          # q = 4
    assert pol(320, 2048, "tensorfloat32") is True   # q = 2
    assert pol(128, 2048, "highest") is True         # 16 chunks
    assert pol(256, 2048, "highest") is False        # aligned, 8 chunks


@pytest.mark.parametrize("highest", [False, True])
def test_gl_fused_loop_misaligned_hop(highest):
    """Fused GL step on a q>1 hop (512/160: lcm-repack with 4 phases) —
    the phase-strided slab path inside _framed_gl_step, both precisions."""
    from nnaudio_tpu import features

    sr, n_fft, hop = 16000, 512, 160
    tt = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 330 * tt).astype(np.float32)
    stft = features.STFT(n_fft=n_fft, hop_length=hop, center=True,
                         output_format="Magnitude", verbose=False)
    S = stft(x[None])
    gl = features.Griffin_Lim(
        n_fft=n_fft, hop_length=hop, n_iter=2, center=True,
        iter_precision="highest" if highest else "default")
    p = {k: jnp.asarray(v) for k, v in gl._params.items()}
    key = jax.random.PRNGKey(11)
    rec_xla = np.asarray(jax.jit(gl._forward)(p, jnp.asarray(S), key))[0]

    b, f, t = S.shape
    plan = framed_matmul.gl_step_plan(b, n_fft + hop * (t - 1), f, n_fft,
                                      hop, highest=highest)
    assert plan is not None and plan["q"] == 4
    rand_phase = jax.random.normal(key, (b, f, t))
    mom = gl.momentum / (1 + gl.momentum)
    framed_matmul._INTERPRET = True
    try:
        rec_fused = np.asarray(jax.jit(
            lambda pp, SS, rp: gl._forward_fused(pp, SS, rp, mom, plan)
        )(p, jnp.asarray(S), rand_phase))[0]
    finally:
        framed_matmul._INTERPRET = False

    assert rec_fused.shape == rec_xla.shape
    scale = np.abs(rec_xla).max()
    err = np.abs(rec_fused - rec_xla).max() / scale
    assert err < (5e-4 if highest else 3e-2), err


def test_analysis_auto_fuse_policy():
    """The round-5 measured dispatch truth table
    (tools/profile_r5_dispatch.py, device-true / floor-corrected):
    128-aligned hops fuse only in fast mode; misaligned (q > 1) hops never
    fuse — EXCEPT small divisor hops (hop < 128 dividing n_fft), where
    XLA's only alternative is the skinny-K chunked einsum and the kernel
    wins at both precisions."""
    auto = dispatch.analysis_auto_fuse
    # q = 1 (hop % 128 == 0): fast yes, HIGHEST no
    for n_fft, hop in ((2048, 512), (1024, 256), (512, 128)):
        assert auto(hop, n_fft, "default") is True
        assert auto(hop, n_fft, "highest") is False
    # q > 1, hop does not divide n_fft (speech hops): XLA both ways
    for n_fft, hop in ((512, 160), (2048, 320)):
        assert auto(hop, n_fft, "default") is False
        assert auto(hop, n_fft, "highest") is False
    # q > 1, small divisor hop: the kernel wins at both precisions
    for n_fft, hop in ((512, 64), (1024, 32)):
        assert auto(hop, n_fft, "default") is True
        assert auto(hop, n_fft, "highest") is True
    # q > 1 divisor hop but too many XLA chunks (gather fallback is fine,
    # and the unrolled-kernel dot count would blow up too): no fuse
    assert auto(8, 2048, "highest") is False


def test_resolve_analysis_fuse_overrides():
    """Explicit config wins over force_fuse wins over the auto policy."""
    from nnaudio_tpu.config import get_config, set_use_pallas_analysis

    cfg = get_config()
    # auto: headline HIGHEST -> False
    assert dispatch.resolve_analysis_fuse(cfg, 512, 2048) is False
    with framed_matmul.force_fuse(True):
        assert dispatch.resolve_analysis_fuse(cfg, 512, 2048) is True
    try:
        set_use_pallas_analysis(False)
        with framed_matmul.force_fuse(True):  # explicit config outranks
            assert dispatch.resolve_analysis_fuse(cfg, 512, 2048) is False
        set_use_pallas_analysis(True)
        assert dispatch.resolve_analysis_fuse(cfg, 512, 160) is True
    finally:
        set_use_pallas_analysis(None)
