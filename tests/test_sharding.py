"""Multi-chip sharding correctness on the 8-device CPU mesh.

The reference's DataParallel smoke tests (test_stft.py:116-141) become
"sharded == unsharded" exactness tests here (SURVEY.md §4): per-example
transforms must be bit-identical under batch sharding, kernel-bank sharding
must concatenate to the replicated result, and the time-sharded STFT must
equal the single-device center=False STFT of the halo-padded signal.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nnaudio_tpu import features, parallel


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.make_mesh(data=8, model=1)


@pytest.fixture(scope="module")
def mesh24():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return parallel.make_mesh(data=2, model=4)


def test_data_parallel_stft_exact(mesh8):
    x = np.random.RandomState(0).randn(16, 4096).astype(np.float32)
    layer = features.STFT(n_fft=512, hop_length=128, output_format="Magnitude",
                          verbose=False)
    want = np.asarray(layer(x))
    run = parallel.data_parallel(layer, mesh8, output_format="Magnitude")
    got = np.asarray(run(x))
    assert np.array_equal(got, want)


def test_data_parallel_mel_exact(mesh8):
    x = np.random.RandomState(1).randn(8, 8192).astype(np.float32)
    layer = features.MelSpectrogram(n_fft=1024, hop_length=256, n_mels=64,
                                    verbose=False)
    want = np.asarray(layer(x))
    run = parallel.data_parallel(layer, mesh8)
    got = np.asarray(run(x))
    assert np.array_equal(got, want)


def test_bank_sharded_cqt_matches_replicated(mesh24):
    x = np.random.RandomState(2).randn(4, 16384).astype(np.float32)
    layer = features.CQT1992v2(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                               hop_length=512, verbose=False)
    want = np.asarray(layer(x, output_format="Magnitude"))
    run = parallel.bank_sharded_apply(layer, mesh24, output_format="Magnitude",
                                      normalization_type="librosa")
    got = np.asarray(run(x))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


def test_shard_kernel_bank_layout(mesh24):
    layer = features.CQT1992v2(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                               verbose=False)
    sharded = parallel.shard_kernel_bank(layer.params, mesh24)
    spec = sharded["cqt_kernels_real"].sharding.spec
    assert spec[0] == "model"
    assert sharded["lenghts"].sharding.spec == jax.sharding.PartitionSpec()


def test_time_sharded_stft_matches_single_device(mesh8):
    n_fft, hop = 512, 128
    halo = n_fft - hop
    x = np.random.RandomState(3).randn(2, 8 * 2048).astype(np.float32)
    layer = features.STFT(n_fft=n_fft, hop_length=hop, center=False,
                          output_format="Complex", verbose=False)
    wcos = np.asarray(layer.params["wcos"])
    wsin = np.asarray(layer.params["wsin"])

    real, imag = parallel.time_sharded_stft(x, wcos, wsin, hop, mesh8)
    # single-device reference: center=False STFT of the halo-zero-padded x
    want = np.asarray(layer(np.pad(x, ((0, 0), (0, halo)))))
    assert np.allclose(np.asarray(real), want[..., 0], rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(imag), -want[..., 1], rtol=1e-4, atol=1e-5)


def test_time_sharded_roundtrip(mesh8):
    n_fft, hop = 512, 128
    x = np.random.RandomState(4).randn(1, 8 * 1024).astype(np.float32)
    basis_layer = features.iSTFT(n_fft=n_fft, hop_length=hop, verbose=False)
    kc = np.asarray(basis_layer.params["kernel_cos"])
    ks = np.asarray(basis_layer.params["kernel_sin"])
    w = np.asarray(basis_layer.params["window_mask"])

    stft_layer = features.STFT(n_fft=n_fft, hop_length=hop, center=False,
                               output_format="Complex", verbose=False)
    wcos = np.asarray(stft_layer.params["wcos"])
    wsin = np.asarray(stft_layer.params["wsin"])

    real, imag_raw = parallel.time_sharded_stft(x, wcos, wsin, hop, mesh8)
    # full-bin spectra for the inverse (torch convention: imag = -sin proj)
    from nnaudio_tpu.core.overlap import extend_fbins

    spec = extend_fbins(jnp.stack((real, -imag_raw), axis=-1))
    rec = parallel.time_sharded_istft(
        spec[..., 0], spec[..., 1], kc, ks, w, hop, mesh8
    )
    rec = np.asarray(rec)
    # interior samples (away from the global edges) must round-trip
    assert np.allclose(rec[:, n_fft:-n_fft], x[:, n_fft:-n_fft],
                       rtol=1e-3, atol=1e-4)


def test_data_parallel_grads(mesh8):
    """DP gradient of a trainable STFT equals the single-device gradient."""
    x = np.random.RandomState(5).randn(8, 2048).astype(np.float32)
    layer = features.STFT(n_fft=256, hop_length=64, trainable=True,
                          output_format="Magnitude", verbose=False)
    params = layer.trainable_params()

    def loss(p, xx):
        return jnp.sum(layer.apply(p, xx, output_format="Magnitude"))

    g_single = jax.grad(loss)(params, x)

    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh8, P("data", None)))
    g_sharded = jax.grad(loss)(params, xs)
    for k in g_single:
        assert np.allclose(np.asarray(g_single[k]), np.asarray(g_sharded[k]),
                           rtol=1e-4, atol=1e-5), k


def test_global_batch_from_host_local(mesh8):
    """Single-process: host-local data IS the global batch; the helper must
    produce a data-sharded array identical to device_put."""
    x = np.random.RandomState(9).randn(16, 128).astype(np.float32)
    arr = parallel.global_batch_from_host_local(x, mesh8)
    assert arr.shape == (16, 128)
    assert arr.sharding.spec == jax.sharding.PartitionSpec("data", None)
    assert np.array_equal(np.asarray(arr), x)


def test_iter_host_batches(mesh8):
    batches = [np.ones((8, 4), np.float32) * i for i in range(3)]
    out = list(parallel.iter_host_batches(iter(batches), mesh8))
    assert len(out) == 3
    for i, arr in enumerate(out):
        assert np.array_equal(np.asarray(arr), batches[i])


def test_time_sharded_mel_composite(mesh8):
    """Filterbank projections are frame-local, so a mel spectrogram composes
    with the time-sharded STFT under plain jit — XLA keeps the T axis
    sharded through the projection."""
    n_fft, hop = 512, 128
    x = np.random.RandomState(10).randn(1, 8 * 1024).astype(np.float32)
    stft_layer = features.STFT(n_fft=n_fft, hop_length=hop, center=False,
                               output_format="Complex", verbose=False)
    mel_layer = features.MelSpectrogram(n_fft=n_fft, hop_length=hop,
                                        center=False, n_mels=32, sr=16000,
                                        verbose=False)
    wcos = stft_layer.params["wcos"]
    wsin = stft_layer.params["wsin"]
    fb = mel_layer.params["mel_basis"]

    real, imag = parallel.time_sharded_stft(x, wcos, wsin, hop, mesh8)
    mel_sharded = jax.jit(
        lambda r, i, f: jnp.einsum("gf,bft->bgt", f, r * r + i * i)
    )(real, imag, fb)

    halo = n_fft - hop
    want = np.asarray(mel_layer(np.pad(x, ((0, 0), (0, halo)))))
    assert np.allclose(np.asarray(mel_sharded), want, rtol=1e-3, atol=1e-5)


def test_contraction_sharded_cqt1992_psum(mesh24):
    """BASELINE north star: kernel bank sharded over the contraction
    (Fourier-bin) axis with psum of partial products == replicated result."""
    x = np.random.RandomState(12).randn(2, 8192).astype(np.float32)
    layer = features.CQT1992(sr=16000, fmin=220, n_bins=40, bins_per_octave=12,
                             hop_length=256, trainable_CQT=True)  # two-stage path
    want = np.asarray(layer(x, output_format="Magnitude",
                            normalization_type="librosa"))
    run = parallel.bank.contraction_sharded_cqt1992(layer, mesh24)
    got = np.asarray(run(x))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), np.abs(got - want).max()


@pytest.mark.parametrize("fmt,norm", [
    ("Complex", "convolutional"),
    ("Phase", "librosa"),
    ("Magnitude", "wrap"),
])
def test_contraction_sharded_cqt1992_general_head(mesh24, fmt, norm):
    """The psum path covers the full output surface, not just the
    Magnitude/librosa head (VERDICT round-1 item 6)."""
    x = np.random.RandomState(13).randn(2, 8192).astype(np.float32)
    layer = features.CQT1992(sr=16000, fmin=220, n_bins=40, bins_per_octave=12,
                             hop_length=256, trainable_CQT=True)
    want = np.asarray(layer(x, output_format=fmt, normalization_type=norm))
    run = parallel.bank.contraction_sharded_cqt1992(
        layer, mesh24, output_format=fmt, normalization_type=norm)
    got = np.asarray(run(x))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4), np.abs(got - want).max()


def test_bank_sharded_vqt_matches_replicated(mesh24):
    """VQT's per-octave banks (cqt_kernels_*_<oct>) row-shard over model."""
    x = np.random.RandomState(14).randn(4, 16384).astype(np.float32)
    layer = features.VQT(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                         hop_length=512, gamma=2, verbose=False)
    want = np.asarray(layer(x, output_format="Magnitude",
                            normalization_type="librosa"))
    sharded = parallel.shard_kernel_bank(layer.params, mesh24)
    assert sharded["cqt_kernels_real_0"].sharding.spec[0] == "model"
    run = parallel.bank_sharded_apply(layer, mesh24, output_format="Magnitude",
                                      normalization_type="librosa")
    got = np.asarray(run(x))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6), np.abs(got - want).max()


def test_bank_sharded_cqt2010v2_matches_replicated(mesh24):
    x = np.random.RandomState(15).randn(4, 16384).astype(np.float32)
    layer = features.CQT2010v2(sr=16000, fmin=55, n_bins=48,
                               bins_per_octave=12, hop_length=512,
                               verbose=False)
    want = np.asarray(layer(x, output_format="Magnitude",
                            normalization_type="librosa"))
    run = parallel.bank_sharded_apply(layer, mesh24, output_format="Magnitude",
                                      normalization_type="librosa")
    got = np.asarray(run(x))
    assert got.shape == want.shape
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6), np.abs(got - want).max()


def test_tensor_parallel_grads(mesh24):
    """TP-sharded gradient: a trainable CQT1992v2 bank row-sharded over
    ``model`` (with the batch over ``data``) must produce the same parameter
    gradients as single-device execution (VERDICT round-1 item 6)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = np.random.RandomState(16).randn(4, 8192).astype(np.float32)
    layer = features.CQT1992v2(sr=16000, fmin=55, n_bins=48,
                               bins_per_octave=12, hop_length=512,
                               trainable=True, verbose=False)
    params = layer.trainable_params()

    def loss(p, xx):
        return jnp.sum(layer.apply(p, xx, output_format="Magnitude",
                                   normalization_type="librosa") ** 2)

    g_single = jax.grad(loss)(params, x)

    p_sharded = {
        k: jax.device_put(v, NamedSharding(
            mesh24, P("model", *([None] * (v.ndim - 1)))))
        for k, v in params.items()
    }
    xs = jax.device_put(x, NamedSharding(mesh24, P("data", None)))
    g_tp = jax.grad(loss)(p_sharded, xs)
    for k in g_single:
        a, b = np.asarray(g_single[k]), np.asarray(g_tp[k])
        # psum/sharded reductions reorder accumulation: compare relative to
        # the gradient's scale, not element-wise atol
        rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert rel < 1e-5, (k, rel)


def test_sharded_checkpoint_restores_onto_different_mesh(mesh24, tmp_path):
    """Multi-host-style checkpointing: save a model-axis-sharded params
    pytree with orbax, restore it onto a DIFFERENT mesh shape (model=4 ->
    model=2) with new target shardings, and run the transform from the
    restored params (ROADMAP "Infra"; reference state_dict contract,
    stft.py:234-245)."""
    from nnaudio_tpu.utils import load_sharded, save_sharded

    layer = features.CQT1992v2(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                               hop_length=512, verbose=False)
    x = np.random.RandomState(7).randn(4, 16384).astype(np.float32)
    want = np.asarray(layer(x, output_format="Magnitude"))

    sharded = parallel.shard_kernel_bank(layer.params, mesh24)
    path = str(tmp_path / "ckpt")
    save_sharded(path, sharded)

    mesh42 = parallel.make_mesh(data=4, model=2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    target_shardings = {
        "cqt_kernels_real": NamedSharding(mesh42, P("model", None)),
        "cqt_kernels_imag": NamedSharding(mesh42, P("model", None)),
    }
    restored = load_sharded(path, layer.params, target_shardings)

    # exact values, new placement
    for k, v in layer.params.items():
        assert np.array_equal(np.asarray(restored[k]), np.asarray(v)), k
    assert restored["cqt_kernels_real"].sharding.mesh.shape["model"] == 2
    assert restored["cqt_kernels_real"].sharding.spec[0] == "model"

    # the restored sharded params drive the bank-sharded forward on the new
    # mesh and reproduce the single-device output
    run = parallel.bank_sharded_apply(layer, mesh42, output_format="Magnitude",
                                      normalization_type="librosa")
    got = np.asarray(run(x, params=restored))
    assert np.allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bank_sharded_frozen_cqt1992_shards_combined(mesh24):
    """Frozen CQT1992 contracts only the composed combined_* bases — bank
    sharding must actually split them (round 3c: they were missing from the
    prefix list, silently replicating the one bank that matters)."""
    from jax.sharding import PartitionSpec as P

    layer = features.CQT1992(sr=16000, fmin=55, n_bins=48, bins_per_octave=12,
                             hop_length=256)
    assert "combined_real" in layer._params
    sharded = parallel.shard_kernel_bank(dict(layer._params), mesh24)
    spec = sharded["combined_real"].sharding.spec
    assert spec == P("model", *([None] * (layer._params["combined_real"].ndim - 1)))

    x = np.random.RandomState(11).randn(4, 8192).astype(np.float32)
    want = np.asarray(layer(x, output_format="Magnitude"))
    run = parallel.bank_sharded_apply(layer, mesh24,
                                      output_format="Magnitude")
    got = np.asarray(run(x))
    assert np.allclose(got, want, rtol=1e-5, atol=1e-5)


def test_time_sharded_fns_are_cached(mesh8):
    """Repeat calls must reuse the jitted shard_map wrapper (round 3c: a
    fresh wrapper per call defeated jax.jit's executable cache)."""
    from nnaudio_tpu.parallel import timeshard

    n_fft, hop = 256, 64
    basis = np.random.RandomState(12).randn(2, 129, n_fft).astype(np.float32)
    x = np.random.RandomState(13).randn(1, 8 * 1024).astype(np.float32)
    before = timeshard._stft_sharded_fn.cache_info()
    timeshard.time_sharded_stft(x, basis[0], basis[1], hop, mesh8)
    timeshard.time_sharded_stft(x, basis[0], basis[1], hop, mesh8)
    after = timeshard._stft_sharded_fn.cache_info()
    assert after.hits >= before.hits + 1


def test_distributed_initialize_single_process_noop():
    # must not raise (and must not pre-initialize the backend via
    # process_count probing) in a plain single-process environment
    parallel.distributed_initialize()


def _fresh_jax_env():
    """Env for a subprocess that must bring up its own JAX runtime: strip the
    parent suite's 8-device XLA flag and any distributed service vars."""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    for k in list(env):
        if k.startswith(("JAX_COORDINATOR", "JAX_NUM_PROCESSES",
                         "JAX_PROCESS_ID")):
            env.pop(k)
    return env


def test_distributed_initialize_error_messages_still_match():
    """Pin the jax.distributed.initialize failure wording that
    ``parallel/input.py`` substring-matches on (advisor round 3): a JAX
    upgrade that rewords the no-cluster error must fail HERE loudly instead
    of silently changing distributed_initialize's fallback behavior."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "try:\n"
        "    jax.distributed.initialize()\n"
        "    print('NOERROR')\n"
        "except (ValueError, RuntimeError) as e:\n"
        "    print('MSG:' + str(e).lower().replace(chr(10), ' '))\n"
    )
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120, env=_fresh_jax_env())
    out = p.stdout
    assert p.returncode == 0, p.stderr
    if "NOERROR" in out:
        return  # auto-detection succeeded single-process: fallback unused
    msg = out.split("MSG:", 1)[1]
    known = ("coordinator_address" in msg or "detect" in msg
             or "before any jax" in msg or "already initialized" in msg)
    assert known, (
        "jax.distributed.initialize's no-cluster error message changed; "
        "update the substring matcher in nnaudio_tpu/parallel/input.py: "
        + msg
    )


def test_multiprocess_dp_matches_single_process(tmp_path):
    """The TRUE multi-host path: two OS processes form a real
    ``jax.distributed`` cluster (localhost coordinator, 4 virtual CPU devices
    each -> 8 global), assemble a global batch from host-local halves with
    ``global_batch_from_host_local``, and run a trainable-Mel loss + grad
    SPMD across both processes. Must equal the single-process computation.

    Reference analog: the DataParallel smoke tests actually ran their
    multi-device path live (/root/reference/Installation/tests/
    test_stft.py:116-141); before this test the multi-process branches of
    parallel/input.py had never executed anywhere.
    """
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    env = _fresh_jax_env()
    ckpt_dir = str(tmp_path / "mp_ckpt")
    procs = [
        subprocess.Popen([sys.executable, worker, coord, str(pid), ckpt_dir],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
            assert p.returncode == 0, out
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                kv = dict(f.split("=", 1) for f in line.split()[1:])
                results[int(kv["pid"])] = (float(kv["loss"]),
                                           float(kv["gsum"]))
    assert set(results) == {0, 1}, outs
    # both processes must agree exactly (replicated outputs)
    assert results[0] == results[1]

    # single-process oracle: same layer, same seed, full batch
    layer = features.MelSpectrogram(
        sr=16000, n_fft=512, n_mels=48, hop_length=256,
        trainable_mel=True, trainable_STFT=True, verbose=False,
    )
    full = np.random.RandomState(0).randn(8, 8192).astype(np.float32)
    params = dict(layer._params)

    def loss_fn(params, x):
        return jnp.mean(layer._forward(params, x) ** 2)

    want_loss = float(jax.jit(loss_fn)(params, full))
    grads = jax.jit(jax.grad(loss_fn))(params, full)
    want_gsum = float(sum(jnp.sum(jnp.abs(g)) for g in grads.values()))
    got_loss, got_gsum = results[0]
    assert np.isclose(got_loss, want_loss, rtol=1e-5), (got_loss, want_loss)
    assert np.isclose(got_gsum, want_gsum, rtol=1e-4), (got_gsum, want_gsum)


def test_downsample_shorter_than_fir_is_empty():
    from nnaudio_tpu.core.resample import downsample_by_n

    fir = np.random.RandomState(14).randn(256).astype(np.float32)  # even taps
    out = downsample_by_n(jnp.asarray(np.zeros((2, 1), np.float32)), fir, 2)
    assert out.shape == (2, 0)


def test_streaming_step_under_batch_sharding(mesh8):
    """The compiled streaming step is a pure array function, so it rides DP
    batch sharding directly: feeding batch-sharded state+chunks gives the
    same frames as unsharded (per-example transform — no collectives)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nnaudio_tpu import streaming

    n_fft, hop = 512, 128
    x = np.random.RandomState(40).randn(8, hop * 40).astype(np.float32)
    sh = NamedSharding(mesh8, P("data"))

    def run(shard: bool):
        s = streaming.StreamingSTFT(n_fft=n_fft, hop_length=hop)
        state = s.init_state(8)
        if shard:
            state = type(state)(jax.device_put(state.buffer, sh),
                                state.primed)
        outs = []
        for pos in range(0, x.shape[1], hop * 8):
            chunk = x[:, pos : pos + hop * 8]
            if shard:
                chunk = jax.device_put(chunk, sh)
            state, fr = s.step(state, chunk)
            if fr.shape[2]:
                outs.append(np.asarray(fr))
        return np.concatenate(outs, axis=2)

    want, got = run(False), run(True)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6 * np.abs(want).max())


@pytest.mark.parametrize("family", ["1992v2", "2010v2"])
def test_bank_sharded_inverse_matches_single_device(mesh24, family):
    """TP inverse CQT: dual-bank rows over `model`, batch over `data`,
    partial signals psum-reduced — equals the single-device inverse."""
    from nnaudio_tpu.parallel.bank import bank_sharded_inverse

    if family == "1992v2":
        layer = features.CQT1992v2(sr=22050, fmin=55, n_bins=48,
                                   hop_length=128, output_format="Complex",
                                   verbose=False)
    else:
        layer = features.CQT2010v2(sr=22050, fmin=55, n_bins=48,
                                   bins_per_octave=12, hop_length=128,
                                   earlydownsample=False,
                                   output_format="Complex", verbose=False)
    x = np.random.RandomState(9).randn(4, 8192).astype(np.float32)
    X = layer(x)
    want = np.asarray(layer.inverse(X))
    got = np.asarray(bank_sharded_inverse(layer, mesh24)(X))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5 * np.abs(want).max())


def test_parallel_wrappers_feed_derived_params(mesh24):
    """Regression (round-4 review): data_parallel / bank_sharded_apply must
    build the forward dict from forward_params (state + derived cascades) —
    the pyramid's parallel chain reads the derived cascade filters."""
    from nnaudio_tpu import set_use_parallel_chain
    from nnaudio_tpu.parallel.bank import bank_sharded_apply
    from nnaudio_tpu.parallel.data import data_parallel

    layer = features.CQT2010v2(sr=22050, fmin=32.7, n_bins=84,
                               bins_per_octave=12, hop_length=512,
                               verbose=False)
    x = np.random.RandomState(11).randn(4, 22050).astype(np.float32)
    want = np.asarray(layer(x))
    try:
        set_use_parallel_chain(True)
        got_dp = np.asarray(data_parallel(layer, mesh24)(x))
        got_tp = np.asarray(bank_sharded_apply(layer, mesh24)(x))
    finally:
        set_use_parallel_chain(None)
    np.testing.assert_allclose(got_dp, want, atol=2e-5 * np.abs(want).max(),
                               rtol=1e-4)
    np.testing.assert_allclose(got_tp, want, atol=2e-5 * np.abs(want).max(),
                               rtol=1e-4)
