"""Fused frame+matmul Pallas TPU kernel (STFT hot path).

Computes ``Y[b, f, t] = sum_s x[b, t*hop + s] * W[f, s]`` for the cos and sin
bases in one pass, without materializing the ``(B, T, n_fft)`` frame tensor in
HBM (both the XLA gather path and the hop-decomposition path re-read every
sample ``n_fft/hop`` times — 4x HBM read traffic at the default hop).

Strategy (hop-decomposition): view the signal as ``(rows, hop)``; frame ``t``
is rows ``t .. t + n_fft/hop - 1`` concatenated. Grid is
``(batch, time_tiles, freq_tiles)`` with the frequency axis innermost:

- the ``(tile_t + n_fft/hop - 1, hop)`` signal slab covering a time tile is
  DMA'd manually from HBM into persistent VMEM scratch **once per time tile**
  (slabs of neighbouring tiles overlap, which BlockSpec block indexing cannot
  express) and reused across all frequency tiles;
- the transposed bases stream through BlockSpec-managed ``(n_fft, tile_f)``
  VMEM blocks (auto double-buffered by the pipeline);
- each step accumulates ``n_chunks`` MXU matmuls, one per hop-row shift — no
  frame matrix is ever formed, in VMEM or HBM.

The supported() gate keeps every resident buffer within the VMEM budget;
outside the envelope the dispatcher falls back to the XLA hop-decomposition
path (ops/dispatch.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INTERPRET = False  # flipped by tests to exercise the kernel on CPU

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the ~16MB/core VMEM


def _pick_tiles(n_fft: int, f: int, t_total: int, hop: int):
    """Choose (tile_t, tile_f) so slab + 2 double-buffered basis blocks + two
    output blocks fit the VMEM budget. Returns None when impossible.

    Unified t512/f128 at both precisions: f128 wins +8% at HIGHEST and pads
    1025 bins to 1152 instead of 1536; t512 halves basis re-streaming (the
    earlier t512 Mosaic crash was specific to t512+f256)."""
    n_chunks = n_fft // hop
    # f128 tiles win at both precisions: better MXU pass pipelining at
    # HIGHEST (+8% vs f256) and minimal frequency-padding waste (1025 bins
    # pad to 1152 instead of 1536). t512 halves basis re-streaming; with f128
    # it compiles fine at HIGHEST too (the earlier Mosaic crash was t512+f256).
    tile_f = min(128, -(-f // 128) * 128)
    tile_t = min(512, -(-t_total // 8) * 8)
    while tile_f >= 128:
        slab_rows = -(-(tile_t + n_chunks - 1) // 8) * 8
        slab = slab_rows * hop * 4
        bases = 2 * 2 * n_fft * tile_f * 4  # two bases, double buffered
        outs = 2 * 2 * tile_t * tile_f * 4
        if slab + bases + outs <= _VMEM_BUDGET:
            return tile_t, tile_f
        tile_f //= 2
    return None


def _fused_kernel(x_hbm, wcos_ref, wsin_ref, real_ref, imag_ref, slab, sem,
                  *, hop, n_fft, tile_t):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    n_chunks = n_fft // hop
    rows = slab.shape[0]

    # one slab DMA per (batch, time-tile); freq tiles (innermost) reuse it
    @pl.when(k == 0)
    def _load_slab():
        from jax.experimental.pallas import tpu as pltpu

        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * tile_t, rows), :], slab, sem
        )
        dma.start()
        dma.wait()

    # frame t = concat(slab[t+c, :] for c in range(n_chunks)); accumulate the
    # matmul chunk by chunk instead of materializing the frame matrix
    real_acc = jnp.zeros((tile_t, wcos_ref.shape[1]), jnp.float32)
    imag_acc = jnp.zeros((tile_t, wsin_ref.shape[1]), jnp.float32)
    for c in range(n_chunks):
        chunk = slab[c : c + tile_t, :]
        real_acc = real_acc + jnp.dot(
            chunk, wcos_ref[c * hop : (c + 1) * hop, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        imag_acc = imag_acc + jnp.dot(
            chunk, wsin_ref[c * hop : (c + 1) * hop, :],
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    real_ref[0, :, :] = real_acc
    imag_ref[0, :, :] = imag_acc


@functools.partial(jax.jit, static_argnames=("hop", "tile_t", "tile_f"))
def _framed_matmul_pair(x, wcos_t, wsin_t, hop, tile_t, tile_f):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, length = x.shape
    n_fft, f = wcos_t.shape
    n_chunks = n_fft // hop
    t_total = (length - n_fft) // hop + 1

    t_pad = -t_total % tile_t
    n_t_tiles = (t_total + t_pad) // tile_t
    f_pad = -f % tile_f
    n_f_tiles = (f + f_pad) // tile_f
    if f_pad:
        wcos_t = jnp.pad(wcos_t, ((0, 0), (0, f_pad)))
        wsin_t = jnp.pad(wsin_t, ((0, 0), (0, f_pad)))
    f_padded = f + f_pad

    slab_rows = -(-(tile_t + n_chunks - 1) // 8) * 8
    rows_needed = (n_t_tiles - 1) * tile_t + slab_rows
    need = rows_needed * hop
    if need > length:
        x = jnp.pad(x, ((0, 0), (0, need - length)))
    x2 = x[:, :need].reshape(b, rows_needed, hop)

    kern = functools.partial(_fused_kernel, hop=hop, n_fft=n_fft, tile_t=tile_t)
    real, imag = pl.pallas_call(
        kern,
        grid=(b, n_t_tiles, n_f_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_fft, tile_f), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, tile_f), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_t, tile_f), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t, tile_f), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_t_tiles * tile_t, f_padded), jnp.float32),
            jax.ShapeDtypeStruct((b, n_t_tiles * tile_t, f_padded), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((slab_rows, hop), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t_total * f * n_fft,
            bytes_accessed=(b * need + 2 * n_fft * f_padded * n_f_tiles
                            + 2 * b * t_total * f) * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(x2, wcos_t, wsin_t)
    real = jnp.swapaxes(real[:, :t_total, :f], 1, 2)
    imag = jnp.swapaxes(imag[:, :t_total, :f], 1, 2)
    return real, imag


def _fused_magnitude_kernel(
    x_hbm, wcos_ref, wsin_ref, out_ref, slab, sem, *, hop, n_fft, tile_t,
    prec, eps, square
):
    """Frame+matmul+magnitude in one pass: the (B, F, T) real/imag pair never
    leaves VMEM — saves their HBM round-trip plus a separate elementwise
    kernel (~30% of the STFT magnitude wall time at the headline config)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    n_chunks = n_fft // hop

    @pl.when(k == 0)
    def _load_slab():
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * tile_t, slab.shape[0]), :], slab, sem
        )
        dma.start()
        dma.wait()

    real = jnp.zeros((tile_t, wcos_ref.shape[1]), jnp.float32)
    imag = jnp.zeros((tile_t, wsin_ref.shape[1]), jnp.float32)
    for c in range(n_chunks):
        chunk = slab[c : c + tile_t, :]
        real = real + jnp.dot(chunk, wcos_ref[c * hop : (c + 1) * hop, :],
                              preferred_element_type=jnp.float32, precision=prec)
        imag = imag + jnp.dot(chunk, wsin_ref[c * hop : (c + 1) * hop, :],
                              preferred_element_type=jnp.float32, precision=prec)
    power = real * real + imag * imag
    if eps:
        power = power + eps
    out_ref[0, :, :] = power if square else jnp.sqrt(power)


@functools.partial(
    jax.jit,
    static_argnames=("hop", "tile_t", "tile_f", "highest", "eps", "square"),
)
def _framed_magnitude(x, wcos_t, wsin_t, hop, tile_t, tile_f, highest, eps,
                      square=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, length = x.shape
    n_fft, f = wcos_t.shape
    n_chunks = n_fft // hop
    t_total = (length - n_fft) // hop + 1

    n_t_tiles = -(-t_total // tile_t)
    f_pad = -f % tile_f
    if f_pad:
        wcos_t = jnp.pad(wcos_t, ((0, 0), (0, f_pad)))
        wsin_t = jnp.pad(wsin_t, ((0, 0), (0, f_pad)))
    f_padded = f + f_pad

    slab_rows = -(-(tile_t + n_chunks - 1) // 8) * 8
    need = ((n_t_tiles - 1) * tile_t + slab_rows) * hop
    if need > length:
        x = jnp.pad(x, ((0, 0), (0, need - length)))
    x2 = x[:, :need].reshape(b, -1, hop)

    prec = (jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT)
    kern = functools.partial(
        _fused_magnitude_kernel, hop=hop, n_fft=n_fft, tile_t=tile_t,
        prec=prec, eps=eps, square=square,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, n_t_tiles, f_padded // tile_f),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_fft, tile_f), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, tile_f), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, tile_f), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_t_tiles * tile_t, f_padded),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, hop), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t_total * f * n_fft,
            bytes_accessed=(b * need + 2 * n_fft * f_padded
                            + b * t_total * f) * 4,
            transcendentals=b * t_total * f,
        ),
        interpret=_INTERPRET,
    )(x2, wcos_t, wsin_t)
    return jnp.swapaxes(out[:, :t_total, :f], 1, 2)


def framed_magnitude_pallas(x, wcos, wsin, hop, highest: bool, eps: float = 0.0,
                            square: bool = False):
    """Fused |STFT| (or |STFT|^2 when ``square``); returns None when outside
    the supported envelope."""
    if not framed_matmul_pair_supported(x, wcos, hop):
        return None
    n_fft = wcos.shape[-1]
    t_total = (x.shape[-1] - n_fft) // hop + 1
    tiles = _pick_tiles(n_fft, wcos.shape[0], t_total, hop)
    if tiles is None:
        return None
    tile_t, tile_f = tiles
    wcos_t = jnp.asarray(wcos, jnp.float32).T
    wsin_t = jnp.asarray(wsin, jnp.float32).T
    return _framed_magnitude(x, wcos_t, wsin_t, hop, tile_t, tile_f,
                             highest, eps, square)


def _fused_filterbank_kernel(
    x_hbm, wcos_ref, wsin_ref, fb_ref, out_ref, slab, sem,
    *, hop, n_fft, tile_t, prec, eps
):
    """Frame+matmul+power+filterbank in one pass: MelSpectrogram (or any
    ``fb @ (|STFT|^2)`` composite) without the (B, F, T) spectrogram ever
    existing. The output block's index map is constant over the frequency
    grid axis, so it stays resident in VMEM and accumulates
    ``P_tile @ fb_tile`` across frequency tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    n_chunks = n_fft // hop

    @pl.when(k == 0)
    def _load_slab():
        dma = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(j * tile_t, slab.shape[0]), :], slab, sem
        )
        dma.start()
        dma.wait()
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])

    real = jnp.zeros((tile_t, wcos_ref.shape[1]), jnp.float32)
    imag = jnp.zeros((tile_t, wsin_ref.shape[1]), jnp.float32)
    for c in range(n_chunks):
        chunk = slab[c : c + tile_t, :]
        real = real + jnp.dot(chunk, wcos_ref[c * hop : (c + 1) * hop, :],
                              preferred_element_type=jnp.float32, precision=prec)
        imag = imag + jnp.dot(chunk, wsin_ref[c * hop : (c + 1) * hop, :],
                              preferred_element_type=jnp.float32, precision=prec)
    power = real * real + imag * imag
    if eps:
        power = power + eps
    out_ref[0, :, :] += jnp.dot(power, fb_ref[:, :],
                                preferred_element_type=jnp.float32,
                                precision=prec)


@functools.partial(
    jax.jit, static_argnames=("hop", "tile_t", "tile_f", "highest", "eps")
)
def _framed_filterbank(x, wcos_t, wsin_t, fb_t, hop, tile_t, tile_f, highest,
                       eps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, length = x.shape
    n_fft, f = wcos_t.shape
    n_mels = fb_t.shape[1]
    n_chunks = n_fft // hop
    t_total = (length - n_fft) // hop + 1

    n_t_tiles = -(-t_total // tile_t)
    f_pad = -f % tile_f
    if f_pad:
        wcos_t = jnp.pad(wcos_t, ((0, 0), (0, f_pad)))
        wsin_t = jnp.pad(wsin_t, ((0, 0), (0, f_pad)))
        fb_t = jnp.pad(fb_t, ((0, f_pad), (0, 0)))
    f_padded = f + f_pad
    m_pad = -n_mels % 128
    if m_pad:
        fb_t = jnp.pad(fb_t, ((0, 0), (0, m_pad)))
    m_padded = n_mels + m_pad

    slab_rows = -(-(tile_t + n_chunks - 1) // 8) * 8
    need = ((n_t_tiles - 1) * tile_t + slab_rows) * hop
    if need > length:
        x = jnp.pad(x, ((0, 0), (0, need - length)))
    x2 = x[:, :need].reshape(b, -1, hop)

    prec = (jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT)
    kern = functools.partial(
        _fused_filterbank_kernel, hop=hop, n_fft=n_fft, tile_t=tile_t,
        prec=prec, eps=eps,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, n_t_tiles, f_padded // tile_f),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_fft, tile_f), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, tile_f), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, m_padded), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, m_padded), lambda i, j, k: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_t_tiles * tile_t, m_padded),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slab_rows, hop), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_total * n_fft * (2 * f + n_mels),
            bytes_accessed=(b * need + 2 * n_fft * f_padded
                            + b * t_total * n_mels) * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(x2, wcos_t, wsin_t, fb_t)
    return jnp.swapaxes(out[:, :t_total, :n_mels], 1, 2)


def framed_filterbank_pallas(x, wcos, wsin, fb, hop, highest: bool,
                             eps: float = 0.0):
    """Fused ``fb @ |STFT|^2``; returns None outside the supported envelope."""
    if not framed_matmul_pair_supported(x, wcos, hop):
        return None
    n_fft = wcos.shape[-1]
    t_total = (x.shape[-1] - n_fft) // hop + 1
    tiles = _pick_tiles(n_fft, wcos.shape[0], t_total, hop)
    if tiles is None:
        return None
    tile_t, tile_f = tiles
    n_mels = fb.shape[0]
    # the filterbank block and resident output add to the VMEM bill
    m_padded = n_mels + (-n_mels % 128)
    extra = (tile_f * m_padded * 2 + tile_t * m_padded * 2) * 4
    if extra > 2 * 1024 * 1024:
        return None
    wcos_t = jnp.asarray(wcos, jnp.float32).T
    wsin_t = jnp.asarray(wsin, jnp.float32).T
    fb_t = jnp.asarray(fb, jnp.float32).T
    return _framed_filterbank(x, wcos_t, wsin_t, fb_t, hop, tile_t, tile_f,
                              highest, eps)


def framed_matmul_pair_supported(x, wcos, hop) -> bool:
    n_fft = wcos.shape[-1]
    length = x.shape[-1]
    if not (
        x.dtype == jnp.float32
        and x.ndim == 2
        and hop > 0
        and n_fft % hop == 0
        and hop % 128 == 0  # slab lane dim must be 128-aligned for DMA slices
        and length >= n_fft
    ):
        return False
    t_total = (length - n_fft) // hop + 1
    return _pick_tiles(n_fft, wcos.shape[0], t_total, hop) is not None


def framed_matmul_pair_pallas(x, wcos, wsin, hop):
    """Fused pair matmul; returns None to signal XLA fallback when the
    configuration is outside the kernel's supported envelope."""
    if not framed_matmul_pair_supported(x, wcos, hop):
        return None
    n_fft, f = wcos.shape[-1], wcos.shape[0]
    t_total = (x.shape[-1] - n_fft) // hop + 1
    tile_t, tile_f = _pick_tiles(n_fft, f, t_total, hop)
    wcos_t = jnp.asarray(wcos, jnp.float32).T
    wsin_t = jnp.asarray(wsin, jnp.float32).T
    return _framed_matmul_pair(x, wcos_t, wsin_t, hop, tile_t, tile_f)


def _synthesis_ola_kernel(
    sre_hbm, sim_hbm, kc_ref, ks_ref, out_ref, slab_re, slab_im, sem,
    *, hop, n_fft, tile_r, slab_cols, prec
):
    """Synthesis matmul + overlap-add in one pass (iSTFT hot path).

    Output rows (of the (rows, hop) signal view) are produced tile by tile;
    row r sums frame contributions ``fr[r-c][c*hop:(c+1)*hop]`` over the
    ``n_chunks`` hop phases, each phase a (tile_r, F) x (F, hop) MXU matmul
    against a shifted slice of the spectrum slab — the (B, n_fft, T) frame
    tensor never exists. The frequency axis streams through the grid's
    innermost dimension, accumulating into the resident output block.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    n_chunks = n_fft // hop
    tile_f = kc_ref.shape[0]

    @pl.when(k == 0)
    def _zero():
        out_ref[0, :, :] = jnp.zeros_like(out_ref[0])

    # spectrum slabs cover frames [j*tile_r - n_chunks + 1, j*tile_r + tile_r)
    # (the caller pre-pads n_chunks-1 leading zero frames, so starts align)
    dma_re = pltpu.make_async_copy(
        sre_hbm.at[i, pl.ds(k * tile_f, tile_f), pl.ds(j * tile_r, slab_cols)],
        slab_re, sem,
    )
    dma_re.start()
    dma_re.wait()
    dma_im = pltpu.make_async_copy(
        sim_hbm.at[i, pl.ds(k * tile_f, tile_f), pl.ds(j * tile_r, slab_cols)],
        slab_im, sem,
    )
    dma_im.start()
    dma_im.wait()

    acc = jnp.zeros((tile_r, hop), jnp.float32)
    for c in range(n_chunks):
        off = n_chunks - 1 - c
        sr = slab_re[:, off : off + tile_r]
        si = slab_im[:, off : off + tile_r]
        kc_c = kc_ref[:, c * hop : (c + 1) * hop]
        ks_c = ks_ref[:, c * hop : (c + 1) * hop]
        dn = (((0,), (0,)), ((), ()))
        acc = acc + jax.lax.dot_general(sr, kc_c, dn,
                                        preferred_element_type=jnp.float32,
                                        precision=prec)
        acc = acc - jax.lax.dot_general(si, ks_c, dn,
                                        preferred_element_type=jnp.float32,
                                        precision=prec)
    out_ref[0, :, :] += acc


@functools.partial(
    jax.jit, static_argnames=("hop", "tile_r", "tile_f", "highest")
)
def _synthesis_ola(spec_re, spec_im, kc_t, ks_t, hop, tile_r, tile_f, highest):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f, t = spec_re.shape
    n_fft = kc_t.shape[1]
    n_chunks = n_fft // hop
    rows = t + n_chunks - 1  # output length rows*hop = n_fft + hop*(t-1)

    n_r_tiles = -(-rows // tile_r)
    slab_cols = -(-(tile_r + n_chunks - 1) // 128) * 128
    # pad T axis: n_chunks-1 leading zero frames so slab starts are j*tile_r,
    # plus trailing pad covering the last slab
    t_pad_end = (n_r_tiles - 1) * tile_r + slab_cols - (n_chunks - 1) - t
    spec_re = jnp.pad(spec_re, ((0, 0), (0, 0),
                                (n_chunks - 1, max(0, t_pad_end))))
    spec_im = jnp.pad(spec_im, ((0, 0), (0, 0),
                                (n_chunks - 1, max(0, t_pad_end))))

    f_pad = -f % tile_f
    if f_pad:
        spec_re = jnp.pad(spec_re, ((0, 0), (0, f_pad), (0, 0)))
        spec_im = jnp.pad(spec_im, ((0, 0), (0, f_pad), (0, 0)))
        kc_t = jnp.pad(kc_t, ((0, f_pad), (0, 0)))
        ks_t = jnp.pad(ks_t, ((0, f_pad), (0, 0)))
    f_padded = f + f_pad

    prec = (jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT)
    kern = functools.partial(
        _synthesis_ola_kernel, hop=hop, n_fft=n_fft, tile_r=tile_r,
        slab_cols=slab_cols, prec=prec,
    )
    out = pl.pallas_call(
        kern,
        grid=(b, n_r_tiles, f_padded // tile_f),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_f, n_fft), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, n_fft), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_r, hop), lambda i, j, k: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_r_tiles * tile_r, hop),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_f, slab_cols), jnp.float32),
            pltpu.VMEM((tile_f, slab_cols), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t * f * n_fft,
            bytes_accessed=(2 * b * f_padded * t + 2 * f_padded * n_fft
                            + b * rows * hop) * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(spec_re, spec_im, kc_t, ks_t)
    return out.reshape(b, -1)[:, : rows * hop]


def synthesis_ola_pallas(spec_re, spec_im, kc, ks, hop, highest: bool):
    """Fused iSTFT synthesis+OLA. ``kc``/``ks``: (F, n_fft) kernels with the
    window, 1/n_fft and Hermitian fold weights pre-applied.
    Returns (B, n_fft + hop*(T-1)) un-normalized signal, or None when the
    configuration is outside the kernel envelope."""
    n_fft = kc.shape[1]
    if not (hop > 0 and n_fft % hop == 0 and hop % 128 == 0
            and spec_re.dtype == jnp.float32):
        return None
    f = kc.shape[0]
    tile_f = 256 if f >= 256 else -(-f // 8) * 8
    tile_r = 256
    n_chunks = n_fft // hop
    slab_cols = -(-(tile_r + n_chunks - 1) // 128) * 128
    vmem = (2 * 2 * tile_f * n_fft + 2 * tile_f * slab_cols
            + 2 * tile_r * hop) * 4
    if vmem > _VMEM_BUDGET:
        return None
    return _synthesis_ola(spec_re, spec_im, jnp.asarray(kc, jnp.float32),
                          jnp.asarray(ks, jnp.float32), hop, tile_r, tile_f,
                          highest)
