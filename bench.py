"""Benchmark harness: STFT throughput on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches BASELINE.md's headline row: STFT n_fft=2048, hop=512 magnitude
over batched audio, full fp32 (HIGHEST) parity precision. ``value`` is
audio-seconds processed per wall-second on one chip. ``vs_baseline`` is the
ratio to the reference implementation pattern (torch conv1d STFT, fp32 CPU —
the reference repo publishes no machine-readable numbers,
BASELINE.json "published": {}), measured on this same host.

Measurement notes (hard-won on the axon TPU tunnel):
- ``block_until_ready`` does NOT synchronize through the tunnel; only a
  host fetch does. We chain ITERS forward passes inside one jit via a scalar
  data dependency (each iteration's input is perturbed by the previous
  output, so XLA cannot hoist or dedupe) and fetch one scalar at the end.
- The chained scalar must be a FULL reduction (``jnp.sum``) of each output:
  consuming a single element lets XLA dead-code-shrink the matmuls.
- Large arrays in a fori_loop carry deoptimize badly; the chain keeps only
  a scalar carry.
"""
from __future__ import annotations

import json
import time

import numpy as np

SR = 22050
N_FFT = 2048
HOP = 512
BATCH = 32
SECONDS = 10.0
ITERS = 10


def bench_ours() -> float:
    import jax
    import jax.numpy as jnp
    from nnaudio_tpu.features import STFT

    length = int(SR * SECONDS)
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, length).astype(np.float32)
    )
    layer = STFT(n_fft=N_FFT, hop_length=HOP, output_format="Magnitude",
                 verbose=False)
    params = dict(layer._params)

    @jax.jit
    def loop(xx):
        acc = 0.0
        for _ in range(ITERS):
            y = layer._forward(params, xx * (1 + acc * 1e-20),
                               output_format="Magnitude")
            acc = acc + jnp.sum(y)
        return acc

    float(loop(x))  # compile + warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(x))
        times.append(time.perf_counter() - t0)
    per_iter = min(times) / ITERS
    return BATCH * SECONDS / per_iter


def bench_reference_torch_cpu() -> float:
    """Reference-pattern STFT: strided conv1d with windowed Fourier kernels
    (the torch implementation strategy), fp32 CPU."""
    import torch
    from scipy.signal import get_window

    n_bins = N_FFT // 2 + 1
    k = np.arange(n_bins)[:, None]
    s = np.arange(N_FFT)[None, :]
    w = get_window("hann", N_FFT, fftbins=True)
    wcos = torch.tensor((np.cos(2 * np.pi * k * s / N_FFT) * w).astype(np.float32)).unsqueeze(1)
    wsin = torch.tensor((np.sin(2 * np.pi * k * s / N_FFT) * w).astype(np.float32)).unsqueeze(1)

    length = int(SR * SECONDS)
    batch = 4  # CPU: keep the wall time bounded; throughput is per audio-second
    x = torch.randn(batch, 1, length)
    pad = torch.nn.ReflectionPad1d(N_FFT // 2)

    def run():
        xp = pad(x)
        re = torch.nn.functional.conv1d(xp, wcos, stride=HOP)
        im = torch.nn.functional.conv1d(xp, wsin, stride=HOP)
        return torch.sqrt(re ** 2 + im ** 2)

    run()  # warm
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = time.perf_counter() - t0
    return batch * SECONDS * iters / dt


def main():
    value = bench_ours()
    try:
        baseline = bench_reference_torch_cpu()
    except Exception:
        baseline = None
    print(json.dumps({
        "metric": "stft_magnitude_throughput_n2048_h512",
        "value": round(value, 1),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }))


if __name__ == "__main__":
    main()
