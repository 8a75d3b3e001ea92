"""Auxiliary subsystems: checkpoint round-trips and the state_dict contract."""
import os

import numpy as np
import pytest

from nnaudio_tpu import features
from nnaudio_tpu.utils import load_params, restore_transform, save_params


def test_npz_checkpoint_roundtrip(tmp_path):
    layer = features.STFT(n_fft=512, hop_length=128, trainable=True,
                          output_format="Magnitude", verbose=False)
    path = str(tmp_path / "stft.npz")
    save_params(path, layer.params)
    loaded = load_params(path)
    assert set(loaded) == set(layer.params)
    for k in loaded:
        assert np.array_equal(loaded[k], np.asarray(layer.params[k]))


def test_restore_transform_roundtrip(tmp_path):
    layer = features.MelSpectrogram(n_fft=512, hop_length=128, n_mels=32,
                                    trainable_mel=True, verbose=False)
    x = np.random.RandomState(0).randn(1, 4096).astype(np.float32)
    before = np.asarray(layer(x))

    path = str(tmp_path / "mel.npz")
    save_params(path, layer.params)

    # perturb, then restore
    layer.update_params({"mel_basis": np.asarray(layer.params["mel_basis"]) * 2})
    assert not np.allclose(np.asarray(layer(x)), before)
    restore_transform(layer, path)
    assert np.array_equal(np.asarray(layer(x)), before)


def test_state_dict_contract():
    layer = features.CQT1992v2(sr=8000, fmin=55, n_bins=24, hop_length=256,
                               verbose=False)
    sd = layer.state_dict()
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    other = features.CQT1992v2(sr=8000, fmin=55, n_bins=24, hop_length=256,
                               verbose=False)
    other.load_state_dict(sd)
    for k in sd:
        assert np.array_equal(np.asarray(other.params[k]), sd[k])


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    layer = features.STFT(n_fft=256, hop_length=64, verbose=False)
    path = str(tmp_path / "ckpt")
    save_params(path, layer.params)
    loaded = load_params(path)
    for k in layer.params:
        assert np.allclose(loaded[k], np.asarray(layer.params[k]))


def test_profiler_trace_smoke(tmp_path):
    from nnaudio_tpu.utils import trace

    layer = features.STFT(n_fft=256, hop_length=64, verbose=False)
    x = np.random.RandomState(0).randn(1, 2048).astype(np.float32)
    logdir = str(tmp_path / "trace")
    with trace(logdir):
        np.asarray(layer(x))
    import glob

    assert glob.glob(os.path.join(logdir, "**", "*"), recursive=True)


def test_bucketing_masks():
    from nnaudio_tpu.utils import (bucket_length, default_buckets, frame_mask,
                                   pad_to_bucket, valid_frame_count)
    import jax.numpy as jnp

    buckets = default_buckets(max_seconds=10, sr=8000)
    assert bucket_length(8500, buckets) >= 8500
    assert bucket_length(10**9, buckets) == buckets[-1]

    rng = np.random.RandomState(0)
    sigs = [rng.randn(5000).astype(np.float32),
            rng.randn(7300).astype(np.float32)]
    batch, valid = pad_to_bucket(sigs, buckets)
    assert batch.shape[0] == 2 and batch.shape[1] >= 7300
    assert list(np.asarray(valid)) == [5000, 7300]
    # padding is zeros
    assert float(jnp.abs(batch[0, 5000:]).max()) == 0.0

    # masked frames of the padded batch match per-utterance unpadded frames
    layer = features.STFT(n_fft=512, hop_length=128, center=False,
                          output_format="Magnitude", verbose=False)
    spec = np.asarray(layer(batch))
    mask = np.asarray(frame_mask(spec.shape[-1], valid, 512, 128,
                                 center=False))
    for i, s in enumerate(sigs):
        ref = np.asarray(layer(s[None]))[0]
        k = int(np.asarray(valid_frame_count(valid[i], 512, 128,
                                             center=False)))
        assert mask[i, :k].all() and not mask[i, k:].any()
        assert np.allclose(spec[i][:, :k], ref[:, :k], rtol=1e-4, atol=1e-5)


def test_bucketing_bounds_compile_count():
    """All lengths within one bucket produce one jitted shape."""
    from nnaudio_tpu.utils import default_buckets, pad_to_bucket

    buckets = default_buckets(max_seconds=4, sr=8000)
    rng = np.random.RandomState(1)
    shapes = set()
    for L in (8100, 9000, 11000):
        batch, _ = pad_to_bucket([rng.randn(L).astype(np.float32)], buckets)
        shapes.add(batch.shape)
    assert len(shapes) == 1
