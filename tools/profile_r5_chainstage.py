"""Round-5: why is ONE decimation stage slow? Controls included.

Measures (iters=32, so the ~10 ms tunnel-fetch floor amortizes to ~0.3 ms):
  - fetch floor: trivial jit (scalar add) — the per-run() roundtrip cost
  - stage1: downsample_by_n(x, fir, 2) on (32, 220500)  [fast mode]
  - chain6: the full 6-stage serial chain
  - control: ONE einsum with stage1's exact shapes on PRE-MATERIALIZED
    frames (no framing) — isolates framing cost from the contraction
  - control2: stage1's framing only (frame_signal, no einsum)
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from nnaudio_tpu import fast_mode
from nnaudio_tpu.config import dot_precision
from nnaudio_tpu.core.resample import downsample_by_n, _banded_matrix, _TILE_R
from nnaudio_tpu.core.frame import frame_signal
from nnaudio_tpu.filters.cqt import create_lowpass_filter

BATCH, LENGTH = 32, 220500


def timed(fn, *args, iters=32, label=""):
    @jax.jit
    def loop(*aa):
        acc = 0.0
        for _ in range(iters):
            y = fn(aa[0] * (1 + acc * 1e-20), *aa[1:])
            acc = acc + (sum(jnp.sum(v) for v in y)
                         if isinstance(y, (tuple, list)) else jnp.sum(y))
        return acc

    t0 = time.perf_counter()
    float(loop(*args))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(loop(*args))
        ts.append((time.perf_counter() - t0) / iters)
    print(f"{label:46s} {min(ts)*1e3:8.3f} ms/iter  (compile {comp:.0f}s)",
          flush=True)
    return min(ts)


def main():
    x = jax.device_put(
        np.random.RandomState(0).randn(BATCH, LENGTH).astype(np.float32))
    fir = jnp.asarray(create_lowpass_filter(
        band_center=0.5, kernel_length=256, transition_bandwidth=0.001))

    # roundtrip floor
    s = jax.device_put(np.float32(1.0))
    t0s = []
    f = jax.jit(lambda a: a + 1.0)
    float(f(s))
    for _ in range(16):
        t0 = time.perf_counter()
        float(f(s))
        t0s.append(time.perf_counter() - t0)
    print(f"{'fetch roundtrip floor':46s} {min(t0s)*1e3:8.3f} ms", flush=True)

    with fast_mode():
        timed(lambda xx: downsample_by_n(xx, fir, 2), x, label="stage1 (220500 -> 110250)")

        def chain6(xx):
            lv = []
            for _ in range(6):
                xx = downsample_by_n(xx, fir, 2)
                lv.append(xx)
            return tuple(lv)

        timed(chain6, x, label="chain x6 serial")

        # stage1's exact internal shapes, framing pre-done
        taps = fir.shape[-1]
        pad = (taps - 1) // 2
        out_len = (LENGTH + 2 * pad - taps) // 2 + 1
        r = min(_TILE_R, out_len)
        n_tiles = -(-out_len // r)
        width = 2 * (r - 1) + taps
        hop = 2 * r
        need = (n_tiles - 1) * hop + width
        xp = jnp.pad(x, ((0, 0), (pad, max(0, need - LENGTH - pad))))
        frames = jax.device_put(np.asarray(frame_signal(xp[:, :need], width, hop)))
        banded = _banded_matrix(fir, 2, r)
        print(f"frames {frames.shape} banded {banded.shape}", flush=True)

        def contract(fr):
            return jnp.einsum("btw,rw->btr", fr, banded,
                              precision=dot_precision(),
                              preferred_element_type=jnp.float32)

        timed(contract, frames, label="stage1 einsum only (pre-framed)")

        def frame_only(xx):
            xpp = jnp.pad(xx, ((0, 0), (pad, max(0, need - LENGTH - pad))))
            return frame_signal(xpp[:, :need], width, hop)

        timed(frame_only, x, label="stage1 framing only")

        # control: dense matmul with the same M, K, N
        M, K, N = BATCH * n_tiles, width, r
        a = jax.device_put(np.random.RandomState(1).randn(M, K).astype(np.float32))
        b = jax.device_put(np.random.RandomState(2).randn(K, N).astype(np.float32))
        t = timed(lambda aa, bb: jnp.matmul(aa, bb, precision=dot_precision(),
                                            preferred_element_type=jnp.float32),
                  a, b, label=f"control dense matmul {M}x{K}x{N}")
        print(f"  -> {2*M*K*N/t/1e12:.1f} TFLOP/s", flush=True)

        # alt stage1: banded matrix TRANSPOSED orientation (rw -> wr)
        bandedT = jnp.asarray(np.asarray(banded).T)

        def contract_T(fr):
            return jnp.einsum("btw,wr->btr", fr, bandedT,
                              precision=dot_precision(),
                              preferred_element_type=jnp.float32)

        timed(contract_T, frames, label="stage1 einsum, (w,r) rhs")

        # alt: polyphase split — fir even/odd on the (rows, 2) view,
        # contraction K=128 per phase instead of 509 with 50% zeros
        fe = fir[0::2]  # 128 taps
        fo = fir[1::2]  # 127 taps

        def polyphase(xx):
            xpp = jnp.pad(xx, ((0, 0), (pad, pad + 2)))
            ev = xpp[:, 0::2]
            od = xpp[:, 1::2]
            fr_e = frame_signal(ev, fe.shape[0], 1)[:, :out_len]
            fr_o = frame_signal(od, fo.shape[0], 1)[:, :out_len]
            return (jnp.einsum("btw,w->bt", fr_e, fe, precision=dot_precision(),
                               preferred_element_type=jnp.float32)
                    + jnp.einsum("btw,w->bt", fr_o, fo,
                                 precision=dot_precision(),
                                 preferred_element_type=jnp.float32))

        # NOTE: frame_signal hop=1 materializes 128x redundancy — this is
        # the naive version; only run to see what XLA does with it
        # timed(polyphase, x, label="stage1 polyphase naive")

        # alt: conv_general_dilated stride-2 (known fusion pathology — measure)
        def conv_stage(xx):
            return jax.lax.conv_general_dilated(
                xx[:, None, :], fir[None, None, :], window_strides=(2,),
                padding=[(pad, pad)],
                dimension_numbers=("NCH", "OIH", "NCH"))[:, 0, :]

        timed(conv_stage, x, label="stage1 conv_general_dilated s2")


if __name__ == "__main__":
    main()
