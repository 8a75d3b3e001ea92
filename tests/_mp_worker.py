"""Two-process CPU worker for the true multi-host code path.

Spawned (never collected by pytest — leading underscore) by
``tests/test_sharding.py::test_multiprocess_dp_matches_single_process`` as
two separate OS processes that form a real ``jax.distributed`` cluster over a
localhost coordinator. This is the only place the multi-process branches of
``nnaudio_tpu/parallel/input.py`` (explicit-kwargs ``distributed_initialize``
+ ``global_batch_from_host_local``) actually execute — the rest of the suite
is single-process on 8 virtual devices.

Each process: 4 virtual CPU devices -> 8 global. Builds its host-local half
of a fixed seeded batch, assembles the global batch-sharded array with zero
cross-host copies, and runs a trainable-Mel forward + loss + grad SPMD over
the 2-process mesh (the grad of replicated params forces a real cross-process
reduction). Prints one RESULT line; the parent asserts equality with the same
computation done single-process.

Also exercises, ACROSS the process boundary: the time-sharded STFT's
ppermute halo exchange (shard boundary 3|4 spans the two processes) and a
sharded orbax checkpoint round-trip (each host persists/reads only its
addressable shards).

Usage: python _mp_worker.py <coordinator_address> <process_id> <ckpt_dir>
"""
import os
import sys

# fresh per-process virtual device count (the parent strips its own XLA_FLAGS)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax

# the axon TPU plugin ignores JAX_PLATFORMS env — only the config flag works
jax.config.update("jax_platforms", "cpu")


def main():
    coord, pid = sys.argv[1], int(sys.argv[2])
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from nnaudio_tpu import parallel

    # the explicit-kwargs path: errors must propagate, no silent fallback
    parallel.distributed_initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    import functools

    import numpy as np
    import jax.numpy as jnp
    from nnaudio_tpu import features

    mesh = parallel.make_mesh()  # (data=8, model=1) spanning both processes

    layer = features.MelSpectrogram(
        sr=16000, n_fft=512, n_mels=48, hop_length=256,
        trainable_mel=True, trainable_STFT=True, verbose=False,
    )

    full = np.random.RandomState(0).randn(8, 8192).astype(np.float32)
    local = full[pid * 4:(pid + 1) * 4]
    gb = parallel.global_batch_from_host_local(local, mesh)

    params = jax.device_put(dict(layer._params), parallel.replicate(mesh))

    @functools.partial(
        jax.jit,
        in_shardings=(parallel.replicate(mesh),
                      parallel.local_batch_sharding(mesh)),
        out_shardings=parallel.replicate(mesh),
    )
    def loss_fn(params, x):
        return jnp.mean(layer._forward(params, x) ** 2)

    loss = float(loss_fn(params, gb))
    grads = jax.jit(
        jax.grad(loss_fn),
        in_shardings=(parallel.replicate(mesh),
                      parallel.local_batch_sharding(mesh)),
        out_shardings=parallel.replicate(mesh),
    )(params, gb)
    gsum = float(sum(jnp.sum(jnp.abs(g)) for g in grads.values()))

    # ---- cross-process collectives: time-sharded STFT halo exchange ----
    # the ppermute halo ships (n_fft - hop) samples between shards; with the
    # time axis spanning BOTH processes, shard boundaries 3|4 cross the
    # process boundary — the first real cross-host collective in this repo.
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_fft, hop = 256, 64
    halo = n_fft - hop
    l_total = 8 * 1024
    full_sig = np.random.RandomState(1).randn(1, l_total).astype(np.float32)
    st = features.STFT(n_fft=n_fft, hop_length=hop, center=False,
                       output_format="Complex", verbose=False)
    local_sig = full_sig[:, pid * (l_total // 2):(pid + 1) * (l_total // 2)]
    gx = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(None, "data")), local_sig)
    real, imag_raw = parallel.time_sharded_stft(
        gx, np.asarray(st._params["wcos"]), np.asarray(st._params["wsin"]),
        hop, mesh)
    # per-process oracle: offline center=False STFT of the halo-padded
    # signal (computed locally and identically on both hosts)
    want = np.asarray(st(np.pad(full_sig, ((0, 0), (0, halo)))))
    for arr, wt in ((real, want[..., 0]), (imag_raw, -want[..., 1])):
        for s in arr.addressable_shards:
            got = np.asarray(s.data)
            ref = wt[s.index]
            assert np.allclose(got, ref, rtol=1e-4, atol=1e-5), (
                pid, s.index, np.abs(got - ref).max())

    # ---- multi-process sharded orbax checkpoint round-trip ----
    from nnaudio_tpu.utils.checkpoint import load_sharded, save_sharded

    ckpt_dir = sys.argv[3]
    bank = np.arange(8 * 160, dtype=np.float32).reshape(8, 160)
    sharded = {"bank": jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), bank[pid * 4:(pid + 1) * 4])}
    save_sharded(ckpt_dir, sharded)
    restored = load_sharded(
        ckpt_dir, {"bank": jax.ShapeDtypeStruct((8, 160), np.float32)},
        {"bank": NamedSharding(mesh, P("data", None))})
    for s in restored["bank"].addressable_shards:
        assert np.array_equal(np.asarray(s.data), bank[s.index]), s.index

    print(f"RESULT pid={pid} loss={loss!r} gsum={gsum!r}", flush=True)


if __name__ == "__main__":
    main()
