"""Streaming STFT/Mel: chunked processing computes exactly the offline
center=False transform's frames at the chunk seams (no approximation, no
recompute; agreement to the last ulp — per-chunk matmul tiling differs).
Beyond-reference capability (the reference is offline-only)."""
import numpy as np
import pytest
import jax.numpy as jnp

from nnaudio_tpu import features, streaming


def _offline(x, n_fft, hop, fmt):
    st = features.STFT(n_fft=n_fft, hop_length=hop, center=False,
                       output_format=fmt, verbose=False)
    return np.asarray(st(x))


@pytest.mark.parametrize("n_fft,hop", [(512, 128), (512, 160), (2048, 512)])
@pytest.mark.parametrize("fmt", ["Magnitude", "Complex"])
def test_stream_equals_offline(n_fft, hop, fmt):
    rng = np.random.RandomState(0)
    x = rng.randn(2, hop * 101 + (n_fft - hop)).astype(np.float32)
    # trim to a hop-multiple total so chunks tile it exactly
    total = (x.shape[1] // hop) * hop
    x = x[:, :total]

    s = streaming.StreamingSTFT(n_fft=n_fft, hop_length=hop,
                                output_format=fmt)
    state = s.init_state(batch=2)
    outs = []
    # uneven hop-multiple chunks, including ones shorter than n_fft
    sizes = [hop, hop * 3, hop * 8, hop * 2, hop * 40]
    pos = 0
    while pos < total:
        c = min(sizes[len(outs) % len(sizes)], total - pos)
        c = (c // hop) * hop or hop
        state, frames = s.step(state, x[:, pos : pos + c])
        pos += c
        if frames.shape[2]:
            outs.append(np.asarray(frames))
    got = np.concatenate(outs, axis=2)
    want = _offline(x, n_fft, hop, fmt)
    assert got.shape == want.shape, (got.shape, want.shape)
    # same frames x same kernels; only the matmul tiling differs per chunk
    # shape, so agreement is to the last ulp, not bitwise
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-5 * scale)


def test_stream_priming_short_chunks():
    """Chunks shorter than n_fft emit zero frames until primed, then the
    stream catches up exactly."""
    n_fft, hop = 512, 128
    x = np.random.RandomState(1).randn(1, hop * 40).astype(np.float32)
    s = streaming.StreamingSTFT(n_fft=n_fft, hop_length=hop)
    state = s.init_state(1)
    outs = []
    for pos in range(0, x.shape[1], hop):
        state, frames = s.step(state, x[:, pos : pos + hop])
        outs.append(np.asarray(frames))
    assert all(o.shape[2] == 0 for o in outs[:3])  # priming: < n_fft samples
    got = np.concatenate(outs, axis=2)
    want = _offline(x, n_fft, hop, "Magnitude")
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


def test_stream_rejects_bad_chunk():
    s = streaming.StreamingSTFT(n_fft=512, hop_length=128)
    with pytest.raises(ValueError):
        s.step(s.init_state(1), np.zeros((1, 100), np.float32))


def test_streaming_mel_matches_offline():
    sr, n_fft, hop, n_mels = 16000, 1024, 256, 64
    x = np.random.RandomState(2).randn(1, hop * 80).astype(np.float32)
    m = streaming.StreamingMel(sr=sr, n_fft=n_fft, hop_length=hop,
                               n_mels=n_mels)
    state = m.init_state(1)
    outs = []
    for pos in range(0, x.shape[1], hop * 16):
        state, mel = m.step(state, x[:, pos : pos + hop * 16])
        if mel.shape[2]:
            outs.append(np.asarray(mel))
    got = np.concatenate(outs, axis=2)
    offline = features.MelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                      n_mels=n_mels, center=False,
                                      verbose=False)
    want = np.asarray(offline(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5 * want.max())


def test_stream_generator_helper():
    """Including a trailing partial chunk (3 hops past the last full
    chunk_len): the generator must process the hop-floored remainder
    rather than silently truncating the feature matrix."""
    n_fft, hop = 512, 128
    x = np.random.RandomState(3).randn(1, hop * 67).astype(np.float32)
    s = streaming.StreamingSTFT(n_fft=n_fft, hop_length=hop)
    got = np.concatenate([np.asarray(f) for f in s.stream(x, hop * 16)],
                         axis=2)
    want = _offline(x, n_fft, hop, "Magnitude")
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


@pytest.mark.parametrize("fmt", ["Magnitude", "Complex"])
def test_streaming_cqt_matches_offline(fmt):
    sr, hop, n_bins = 22050, 256, 48
    kw = dict(sr=sr, hop_length=hop, fmin=110, n_bins=n_bins,
              bins_per_octave=12)
    s = streaming.StreamingCQT(output_format=fmt, **kw)
    total = hop * 200 + s.buf_cap  # ensure many frames
    total = (total // hop) * hop
    x = np.random.RandomState(4).randn(1, total).astype(np.float32)

    state = s.init_state(1)
    outs = []
    for pos in range(0, total, hop * 20):
        state, frames = s.step(state, x[:, pos : pos + hop * 20])
        if frames.shape[2]:
            outs.append(np.asarray(frames))
    got = np.concatenate(outs, axis=2)

    offline = features.CQT1992v2(center=False, output_format=fmt, **kw)
    want = np.asarray(offline(x, output_format=fmt))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


def test_streaming_istft_matches_offline():
    """Chunked OLA synthesis == offline iSTFT(center=False) exactly, and
    the full analysis->synthesis streaming loop reconstructs the signal."""
    n_fft, hop = 512, 128
    b, t_total = 2, 96
    rng = np.random.RandomState(5)
    x = rng.randn(b, (t_total - 1) * hop + n_fft).astype(np.float32)

    st = features.STFT(n_fft=n_fft, hop_length=hop, center=False,
                       output_format="Complex", verbose=False)
    X = np.asarray(st(x))
    offline = features.iSTFT(n_fft=n_fft, hop_length=hop, center=False,
                             verbose=False)
    want = np.asarray(offline(X, onesided=True))

    s = streaming.StreamingiSTFT(n_fft=n_fft, hop_length=hop)
    state = s.init_state(b)
    outs = []
    pos = 0
    for size in (1, 7, 20, 11, 40, t_total):  # uneven frame chunks
        size = min(size, t_total - pos)
        if size == 0:
            break
        state, samples = s.step(state, X[:, :, pos : pos + size])
        outs.append(np.asarray(samples))
        pos += size
    outs.append(np.asarray(s.flush(state)))
    got = np.concatenate(outs, axis=1)
    assert got.shape == want.shape, (got.shape, want.shape)
    scale = np.abs(want).max()
    # edges divide by a near-zero hann envelope, where last-ulp differences
    # in the (identical-sum, different-order) envelope accumulation get
    # amplified; the interior must be tight
    interior = slice(n_fft, -n_fft)
    np.testing.assert_allclose(got[:, interior], want[:, interior],
                               atol=1e-5 * scale)
    np.testing.assert_allclose(got, want, atol=2e-3 * scale)

    # round-trip through BOTH streaming directions: interior must match x
    np.testing.assert_allclose(got[:, interior], x[:, interior],
                               atol=1e-4 * np.abs(x).max())


def _run_stream(s, x, chunk):
    state = s.init_state(x.shape[0])
    outs = []
    for pos in range(0, x.shape[1], chunk):
        state, out = s.step(state, x[:, pos : pos + chunk])
        if out.shape[2]:
            outs.append(np.asarray(out))
    return np.concatenate(outs, axis=2)


def test_streaming_mfcc_matches_offline():
    sr, n_fft, hop = 16000, 1024, 256
    x = np.random.RandomState(7).randn(2, hop * 70).astype(np.float32)
    s = streaming.StreamingMFCC(sr=sr, n_fft=n_fft, hop_length=hop,
                                n_mfcc=13, n_mels=40)
    got = _run_stream(s, x, hop * 16)
    offline = features.MFCC(sr=sr, n_mfcc=13, top_db=None, n_fft=n_fft,
                            hop_length=hop, n_mels=40, center=False,
                            verbose=False)
    want = np.asarray(offline(x))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-4 * np.abs(want).max())


def test_streaming_mfcc_rejects_top_db():
    with pytest.raises(ValueError, match="top_db"):
        streaming.StreamingMFCC(top_db=80.0)


def test_streaming_gammatone_matches_offline():
    sr, n_fft, hop = 16000, 1024, 256
    x = np.random.RandomState(8).randn(1, hop * 70).astype(np.float32)
    s = streaming.StreamingGammatone(sr=sr, n_fft=n_fft, hop_length=hop,
                                     n_bins=48, fmin=20)
    got = _run_stream(s, x, hop * 16)
    offline = features.Gammatonegram(sr=sr, n_fft=n_fft, hop_length=hop,
                                     n_bins=48, fmin=20, center=False,
                                     verbose=False)
    want = np.asarray(offline(x))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())


def test_streaming_chroma_matches_offline():
    sr, n_fft, hop = 22050, 2048, 512
    x = np.random.RandomState(9).randn(1, hop * 50).astype(np.float32)
    s = streaming.StreamingChroma(sr=sr, n_fft=n_fft, hop_length=hop)
    got = _run_stream(s, x, hop * 10)
    offline = features.ChromaSTFT(sr=sr, n_fft=n_fft, hop_length=hop,
                                  center=False, verbose=False)
    want = np.asarray(offline(x))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-4,
                               atol=1e-5 * np.abs(want).max())


def test_streaming_fuse_override_traces_fused_path(monkeypatch):
    """fuse=True must route a tiny chunk through the fused dispatch even
    below the workload gate (interpret-safe on CPU only for the gate logic:
    we assert the override flag is consulted, not the kernel itself)."""
    from nnaudio_tpu.ops import framed_matmul as fm

    monkeypatch.setattr(fm, "_MIN_FUSED_FRAMES", 10**9)
    assert not fm._fuse_workload_ok(4096)
    with fm.force_fuse(True):
        assert fm._fuse_workload_ok(1)
    with fm.force_fuse(False):
        assert not fm._fuse_workload_ok(10**10)
    assert fm._FORCE_FUSE.get() is None  # restored

    # a fuse-pinned stream still computes exact results (XLA fallback path
    # exists for envelopes the kernels don't support, e.g. CPU interpret)
    n_fft, hop = 512, 128
    x = np.random.RandomState(10).randn(1, hop * 40).astype(np.float32)
    s = streaming.StreamingSTFT(n_fft=n_fft, hop_length=hop, fuse=False)
    got = _run_stream(s, x, hop * 8)
    want = _offline(x, n_fft, hop, "Magnitude")
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


def test_fuse_overrides_synthesis_auto_policy():
    """StreamingiSTFT's fuse arg must override the SYNTHESIS auto-policy,
    not just the workload gate: at an aligned fp32 config the auto policy
    picks XLA, so without the dispatch-level override fuse=True was a
    silent no-op (round-4 review finding). Explicit config still wins."""
    from nnaudio_tpu import set_use_pallas_synthesis
    from nnaudio_tpu.config import get_config
    from nnaudio_tpu.ops import framed_matmul as fm
    from nnaudio_tpu.ops.dispatch import (resolve_synthesis_fuse,
                                          synthesis_auto_fuse)

    cfg = get_config()
    assert cfg.use_pallas_synthesis is None  # auto
    # aligned small-overlap fp32: measured auto policy keeps XLA...
    assert not synthesis_auto_fuse(512, 2048, "highest")
    assert not resolve_synthesis_fuse(cfg, 512, 2048)
    # ...but a fuse=True stream forces the kernel
    with fm.force_fuse(True):
        assert resolve_synthesis_fuse(cfg, 512, 2048)
    # misaligned hop: auto says kernel; fuse=False forces XLA
    assert synthesis_auto_fuse(160, 512, "highest")
    with fm.force_fuse(False):
        assert not resolve_synthesis_fuse(cfg, 160, 512)
    # explicit config outranks the stream's wish
    try:
        set_use_pallas_synthesis(False)
        with fm.force_fuse(True):
            assert not resolve_synthesis_fuse(get_config(), 512, 2048)
    finally:
        set_use_pallas_synthesis(None)


def test_streaming_inverse_cqt_matches_offline():
    """StreamingInverseCQT: concat(steps..., flush()) equals the offline
    center=False dual-synthesis inverse EXACTLY (OLA is linear and there is
    no envelope carry), and pairing it with StreamingCQT closes the online
    analyze->resynthesize loop."""
    sr, hop = 22050, 128
    kw = dict(sr=sr, fmin=55, n_bins=48, hop_length=hop)
    off = features.CQT1992v2(center=False, output_format="Complex",
                             verbose=False, **kw)
    x = np.random.RandomState(7).randn(2, hop * 160).astype(np.float32)
    X = np.asarray(off(x))
    want = np.asarray(off.inverse(X))

    sinv = streaming.StreamingInverseCQT(verbose=False, **kw)
    state = sinv.init_state(2)
    outs = []
    T = X.shape[2]
    for a in range(0, T, 5):
        state, out = sinv.step(state, X[:, :, a:min(a + 5, T)])
        outs.append(np.asarray(out))
    outs.append(np.asarray(sinv.flush(state)))
    got = np.concatenate(outs, axis=-1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())

    # closed loop: streaming analysis feeding streaming synthesis
    scqt = streaming.StreamingCQT(output_format="Complex", verbose=False,
                                  **kw)
    a_state = scqt.init_state(2)
    s_state = sinv.init_state(2)
    pieces = []
    for pos in range(0, x.shape[-1], hop * 16):
        a_state, frames = scqt.step(a_state, x[:, pos:pos + hop * 16])
        if frames.shape[2]:
            s_state, out = sinv.step(s_state, frames)
            pieces.append(np.asarray(out))
    pieces.append(np.asarray(sinv.flush(s_state)))
    loop = np.concatenate(pieces, axis=-1)
    np.testing.assert_allclose(loop, want[:, :loop.shape[-1]],
                               atol=1e-5 * np.abs(want).max())


def test_streaming_cache_growth_warns():
    n_fft, hop = 512, 128
    s = streaming.StreamingSTFT(n_fft=n_fft, hop_length=hop)
    state = s.init_state(1)
    # prime fully first so `primed` stops changing, then vary chunk length
    state, _ = s.step(state, np.zeros((1, n_fft), np.float32))
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        for k in range(1, 20):
            state, _ = s.step(state, np.zeros((1, hop * k), np.float32))
    msgs = [str(r.message) for r in rec if "distinct" in str(r.message)]
    assert msgs, "expected a cache-growth warning after many chunk sizes"


def test_streaming_mel_power1_matches_offline():
    """The non-fused (power != 2) StreamingMel branch."""
    sr, n_fft, hop, n_mels = 16000, 512, 128, 40
    x = np.random.RandomState(6).randn(1, hop * 60).astype(np.float32)
    m = streaming.StreamingMel(sr=sr, n_fft=n_fft, hop_length=hop,
                               n_mels=n_mels, power=1.0)
    state = m.init_state(1)
    outs = []
    for pos in range(0, x.shape[1], hop * 12):
        state, mel = m.step(state, x[:, pos : pos + hop * 12])
        if mel.shape[2]:
            outs.append(np.asarray(mel))
    got = np.concatenate(outs, axis=2)
    offline = features.MelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                      n_mels=n_mels, power=1.0, center=False,
                                      verbose=False)
    want = np.asarray(offline(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5 * want.max())
