"""Fused frame+matmul Pallas TPU kernel (STFT hot path).

Computes ``Y[b, f, t] = sum_s x[b, t*hop + s] * W[f, s]`` for the cos and sin
bases in one pass, without materializing the ``(B, T, n_fft)`` frame tensor in
HBM (the XLA gather path duplicates every sample ``n_fft/hop`` times — 4x HBM
read traffic at the default hop).

Strategy (hop-decomposition): view the signal as ``(rows, hop)``; frame ``t``
is rows ``t .. t + n_fft/hop - 1`` concatenated. Each grid program DMAs the
``(tile_t + n_fft/hop - 1, hop)`` slab covering its ``tile_t`` frames from HBM
into VMEM, assembles the local ``(tile_t, n_fft)`` frame matrix from static
row-shifted slices (dense copies, no gather), and runs two MXU matmuls
against the transposed bases.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INTERPRET = False  # flipped by tests to exercise the kernel on CPU


def _fused_kernel(
    x_hbm, wcos_ref, wsin_ref, real_ref, imag_ref, *, hop, n_fft, tile_t
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    n_chunks = n_fft // hop
    # slab rows padded to a sublane multiple (DMA slices must be 8-aligned)
    rows = -(-(tile_t + n_chunks - 1) // 8) * 8

    def body(slab, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * tile_t, rows), :], slab, sem
        )
        dma.start()
        dma.wait()
        # frame t = concat(slab[t+c, :] for c in range(n_chunks)); instead of
        # materializing the concatenated frame matrix, accumulate the matmul
        # chunk by chunk: Y = sum_c slab[c:c+tile_t] @ W[c*hop:(c+1)*hop]
        real_acc = jnp.zeros((tile_t, wcos_ref.shape[1]), jnp.float32)
        imag_acc = jnp.zeros((tile_t, wsin_ref.shape[1]), jnp.float32)
        for c in range(n_chunks):
            chunk = slab[c : c + tile_t, :]
            real_acc = real_acc + jnp.dot(
                chunk,
                wcos_ref[c * hop : (c + 1) * hop, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            imag_acc = imag_acc + jnp.dot(
                chunk,
                wsin_ref[c * hop : (c + 1) * hop, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        real_ref[0, :, :] = real_acc
        imag_ref[0, :, :] = imag_acc

    pl.run_scoped(
        body,
        slab=pltpu.VMEM((rows, hop), jnp.float32),
        sem=pltpu.SemaphoreType.DMA(()),
    )


@functools.partial(jax.jit, static_argnames=("hop",))
def _framed_matmul_pair(x, wcos_t, wsin_t, hop):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, length = x.shape
    n_fft, f = wcos_t.shape
    n_chunks = n_fft // hop
    t_total = (length - n_fft) // hop + 1

    tile_t = min(256, -(-t_total // 8) * 8)
    t_pad = -t_total % tile_t
    n_tiles = (t_total + t_pad) // tile_t
    slab_rows = -(-(tile_t + n_chunks - 1) // 8) * 8
    rows_needed = (n_tiles - 1) * tile_t + slab_rows
    need = rows_needed * hop
    if need > length:
        x = jnp.pad(x, ((0, 0), (0, need - length)))
    x2 = x[:, :need].reshape(b, rows_needed, hop)

    kern = functools.partial(_fused_kernel, hop=hop, n_fft=n_fft, tile_t=tile_t)
    real, imag = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((n_fft, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_t, f), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, f), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_tiles * tile_t, f), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles * tile_t, f), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(x2, wcos_t, wsin_t)
    real = jnp.swapaxes(real[:, :t_total, :], 1, 2)
    imag = jnp.swapaxes(imag[:, :t_total, :], 1, 2)
    return real, imag


def framed_matmul_pair_supported(x, wcos, hop) -> bool:
    n_fft = wcos.shape[-1]
    length = x.shape[-1]
    return (
        x.dtype == jnp.float32
        and x.ndim == 2
        and hop > 0
        and n_fft % hop == 0
        and hop % 128 == 0  # slab lane dim must be 128-aligned for DMA slices
        and length >= n_fft
    )


def framed_matmul_pair_pallas(x, wcos, wsin, hop):
    """Fused pair matmul; returns None to signal XLA fallback when the
    configuration is outside the kernel's supported envelope."""
    if not framed_matmul_pair_supported(x, wcos, hop):
        return None
    wcos_t = jnp.asarray(wcos, jnp.float32).T
    wsin_t = jnp.asarray(wsin, jnp.float32).T
    return _framed_matmul_pair(x, wcos_t, wsin_t, hop)
