"""Data-parallel scaling sweep: audio-s/s at 1..N devices.

On a real pod slice this measures the BASELINE scaling-efficiency target
(>= 90% linear from 1 chip). On a single tunneled chip (this dev
environment) or the virtual CPU mesh it validates the harness; virtual-CPU
"scaling" shares one socket and is not a hardware measurement.

Run: python tools/bench_scaling.py            (real devices)
     JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/bench_scaling.py          (harness check)
"""
from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

SR, SECONDS, PER_DEV_BATCH, ITERS = 22050, 10.0, 16, 8


def measure(n_dev: int) -> float:
    from nnaudio_tpu import features, parallel

    mesh = parallel.make_mesh(data=n_dev, model=1,
                              devices=jax.devices()[:n_dev])
    layer = features.STFT(n_fft=2048, hop_length=512,
                          output_format="Magnitude", verbose=False)
    batch = PER_DEV_BATCH * n_dev
    x = parallel.shard_batch(
        np.random.RandomState(0).randn(batch, int(SR * SECONDS))
        .astype(np.float32), mesh)
    params = jax.device_put(layer.params)

    @jax.jit
    def loop(xx):
        acc = 0.0
        for _ in range(ITERS):
            y = layer._forward(params, xx * (1 + acc * 1e-20),
                               output_format="Magnitude")
            acc = acc + jnp.sum(y)
        return acc

    float(loop(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x))
        times.append(time.perf_counter() - t0)
    return batch * SECONDS * ITERS / min(times)


def main():
    n = len(jax.devices())
    print(f"devices: {n} x {jax.devices()[0].device_kind}")
    base = None
    sizes = sorted({1, 2, 4, 8, n} & set(range(1, n + 1)))
    for k in sizes:
        rate = measure(k)
        if base is None:
            base = rate
        eff = rate / (base * k) * 100
        print(f"  {k} device(s): {rate:,.0f} audio-s/s  "
              f"(scaling efficiency {eff:.0f}%)")


if __name__ == "__main__":
    main()
