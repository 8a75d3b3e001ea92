"""Shard one long utterance across chips along the time axis.

Demonstrates the sequence-parallel STFT: the waveform lives sharded over the
mesh's data axis, each chip frames its chunk after an (n_fft - hop)-sample
halo exchange over ICI, and the output spectrogram comes back time-sharded.
Runs anywhere via the 8-device virtual CPU mesh.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python examples/long_audio_sharded.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

if jax.default_backend() not in ("tpu",) and len(jax.devices()) < 2:
    jax.config.update("jax_platforms", "cpu")

from nnaudio_tpu import features, parallel


def main():
    n_dev = len(jax.devices())
    mesh = parallel.make_mesh(data=n_dev, model=1)
    n_fft, hop = 2048, 512

    # ten minutes of audio in one utterance
    sr = 22050
    x = np.random.RandomState(0).randn(1, (sr * 600 // (n_dev * hop))
                                       * n_dev * hop).astype(np.float32)

    stft = features.STFT(n_fft=n_fft, hop_length=hop, center=False,
                         output_format="Complex", verbose=False)
    real, imag = parallel.time_sharded_stft(
        x, stft.params["wcos"], stft.params["wsin"], hop, mesh
    )
    print(f"{n_dev} devices, input {x.shape} -> spectrogram {real.shape}")
    print("output sharding:", real.sharding)


if __name__ == "__main__":
    main()
