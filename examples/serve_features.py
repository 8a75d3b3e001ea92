"""Production-style batched feature extraction over a device mesh.

A minimal serving loop: utterance batches run through the Mel frontend
data-parallel over every chip. Reports compute throughput (batches resident
on device — what a pod slice with local hosts sees) and end-to-end
throughput including host->device transfer. NOTE: through a remote-TPU
tunnel (this dev environment) the transfer leg is pathologically slow and
dominates; on real TPU hosts the input pipeline feeds locally.

Run: python examples/serve_features.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import features, parallel


def main():
    sr, seconds, batch = 16000, 10.0, 32
    mesh = parallel.make_mesh(model=1)
    frontend = features.MelSpectrogram(sr=sr, n_fft=1024, hop_length=256,
                                       n_mels=80, verbose=False)
    run = parallel.data_parallel(frontend, mesh)

    rng = np.random.RandomState(0)
    host_batches = [rng.randn(batch, int(sr * seconds)).astype(np.float32)
                    for _ in range(4)]

    # end-to-end: host batch -> sharded device batch -> features
    out = run(host_batches[0])  # warm/compile
    np.asarray(out)
    t0 = time.perf_counter()
    for hb in host_batches:
        out = run(hb)
    np.asarray(out)
    e2e = len(host_batches) * batch * seconds / (time.perf_counter() - t0)

    # steady-state compute: the batch loop lives inside one jitted scan, as a
    # production serving loop would pipeline it (per-dispatch latency through
    # this dev environment's remote-TPU tunnel is ~25 ms and would otherwise
    # dominate)
    stacked = jnp.stack([parallel.shard_batch(hb, mesh) for hb in host_batches])
    params = jax.device_put(frontend.params)
    iters = 5

    @jax.jit
    def run_all(params, xs):
        def body(acc, x):
            y = frontend._forward(params, x * (1 + acc * 1e-20))
            return acc + jnp.sum(y), None
        acc = 0.0
        for _ in range(iters):
            acc, _ = jax.lax.scan(body, acc, xs)
        return acc

    float(run_all(params, stacked))  # warm
    t0 = time.perf_counter()
    float(run_all(params, stacked))  # host fetch = the only reliable sync
    comp = iters * len(host_batches) * batch * seconds / (time.perf_counter() - t0)

    n_dev = len(mesh.devices.flat)
    print(f"{n_dev} device(s): compute {comp:,.0f} audio-s/s | "
          f"end-to-end incl. host transfer {e2e:,.0f} audio-s/s")


if __name__ == "__main__":
    main()
