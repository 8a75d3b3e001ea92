"""One-shot runner for the round-3 on-chip backlog (post tunnel outage).

Runs, in order, against the real TPU:
  1. a calm-chip probe (abort early if the shared chip is in a contention
     window — all numbers would be garbage),
  2. the full verification drive (tools/verify_tpu.py — includes the new
     fused-GL fixed-point-map check),
  3. the round-3b A/Bs (tools/profile_r3b.py: fused pyramid vs loop, CFP
     MXU-rfft vs XLA-fft) whose results decide two auto policies:
       - config.use_fused_pyramid auto (currently OFF): flip ON if the
         fused contraction wins both precisions,
       - config.use_mxu_fft auto (currently TPU-on): flip OFF if the MXU
         path loses,
  4. a bench.py smoke run (all rows parse, no fallback warnings).

Usage: python tools/onchip_queue.py [--force]
Exits nonzero on verify failure, or immediately (rc=3) when the calm-chip
probe measures below 15 TFLOP/s bf16 — pass --force to run the backlog on a
contended chip anyway (the A/B results then should NOT be used to set auto
policies).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOLS = os.path.join(REPO, "tools")


LOGDIR = os.path.join(REPO, "tools", "onchip_logs")


def run(name, cmd, timeout):
    print(f"\n=== {name} ===", flush=True)
    t0 = time.time()
    os.makedirs(LOGDIR, exist_ok=True)
    slug = name.split()[0].replace("/", "_")
    log_path = os.path.join(LOGDIR, f"{slug}.log")
    # cwd=REPO: the child scripts resolve the package via sys.path.insert(".")
    # Each child writes straight to tools/onchip_logs/<step>.log (unbuffered
    # file handle) so the A/B data and verify results land on disk —
    # committable — even if the invoking session dies mid-backlog or the
    # child hangs into its timeout.
    rc = None
    with open(log_path, "w") as log:
        try:
            p = subprocess.run([sys.executable, "-u"] + cmd, cwd=REPO,
                               timeout=timeout, stdout=log,
                               stderr=subprocess.STDOUT)
            rc = p.returncode
        except subprocess.TimeoutExpired:
            log.write(f"\n=== TIMEOUT after {timeout}s ===\n")
            rc = 124
    sys.stdout.write(open(log_path).read())
    print(f"=== {name}: rc={rc} in {time.time()-t0:.0f}s "
          f"(log: {log_path}) ===", flush=True)
    return rc


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    d = jax.devices()
    print("devices:", d)

    # calm-chip probe (chained bf16 matmuls; calm ~33+ TFLOP/s at n=4096)
    n = 4096
    a = jnp.asarray(np.random.RandomState(0).randn(n, n), jnp.bfloat16)

    @jax.jit
    def loop(a):
        acc = 0.0
        x = a
        for _ in range(8):
            x = jnp.matmul(x, a, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16) * 1e-2
            acc += jnp.sum(x.astype(jnp.float32))
        return acc

    float(loop(a))
    t0 = time.perf_counter()
    float(loop(a))
    tflops = 2 * n**3 * 8 / (time.perf_counter() - t0) / 1e12
    print(f"probe: {tflops:.1f} TFLOP/s bf16")
    if tflops < 15:
        print("CHIP CONTENTION WINDOW — numbers unreliable; rerun later")
        if "--force" not in sys.argv:
            print("aborting (pass --force to run anyway)")
            sys.exit(3)

    rc = run("verify_tpu", [os.path.join(TOOLS, "verify_tpu.py")],
             timeout=3600)
    run("profile_r3b (pyramid + MXU-fft A/B)",
        [os.path.join(TOOLS, "profile_r3b.py")], timeout=3600)
    run("profile_r4_chain (parallel vs serial pyramid chain A/B)",
        [os.path.join(TOOLS, "profile_r4_chain.py")], timeout=3600)
    run("bench_streaming (serving latency table)",
        [os.path.join(TOOLS, "bench_streaming.py")], timeout=3600)
    run("bench smoke", [os.path.join(REPO, "bench.py")], timeout=3600)
    sys.exit(rc)


if __name__ == "__main__":
    main()
