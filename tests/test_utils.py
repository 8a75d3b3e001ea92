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
