"""Online (chunked) feature extraction with nnaudio_tpu.streaming.

Simulates a serving loop that receives 100 ms audio chunks per utterance
batch and emits mel frames incrementally — per-chunk latency and exact
agreement with the offline transform are reported. The reference (and
librosa) have no streaming path: a server would re-run the transform over
a growing buffer (O(L^2)) or hand-roll the overlap carry this module
implements.

Run: python examples/stream_features.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np

from nnaudio_tpu import features, streaming


def main():
    sr, batch = 16000, 16
    n_fft, hop, n_mels = 1024, 256, 80
    chunk = 1600  # 100 ms at 16 kHz (a multiple of hop? 1600/256 no ->)
    chunk = (chunk // hop) * hop  # 1536 samples = 96 ms
    n_chunks = 100

    rng = np.random.RandomState(0)
    audio = rng.randn(batch, chunk * n_chunks).astype(np.float32)

    m = streaming.StreamingMel(sr=sr, n_fft=n_fft, hop_length=hop,
                               n_mels=n_mels)
    state = m.init_state(batch)

    # warm both step shapes (first chunk primes; later chunks steady-state)
    s2, f = m.step(state, audio[:, :chunk])
    m.step(s2, audio[:, chunk : 2 * chunk])

    state = m.init_state(batch)
    outs, lat = [], []
    for i in range(n_chunks):
        t0 = time.perf_counter()
        state, mel = m.step(state, audio[:, i * chunk : (i + 1) * chunk])
        np.asarray(mel)  # host fetch = the serving-visible latency
        lat.append(time.perf_counter() - t0)
        if mel.shape[2]:
            outs.append(np.asarray(mel))

    got = np.concatenate(outs, axis=2)
    offline = features.MelSpectrogram(sr=sr, n_fft=n_fft, hop_length=hop,
                                      n_mels=n_mels, center=False,
                                      verbose=False)
    want = np.asarray(offline(audio))
    err = np.abs(got - want).max() / np.abs(want).max()

    ms = sorted(l * 1e3 for l in lat)
    print(f"{n_chunks} chunks x {chunk} samples x batch {batch}: "
          f"median latency {ms[len(ms)//2]:.2f} ms/chunk "
          f"(p95 {ms[int(len(ms)*0.95)]:.2f}), "
          f"offline equivalence rel err {err:.2e}")
    assert err < 1e-5


if __name__ == "__main__":
    main()
