"""Fused frame+matmul Pallas TPU kernels (STFT hot path).

Computes ``Y[b, f, t] = sum_s x[b, t*hop + s] * W[f, s]`` for the cos and sin
bases in one pass, without materializing the ``(B, T, n_fft)`` frame tensor in
HBM (both the XLA gather path and the hop-decomposition path re-read every
sample ``n_fft/hop`` times — 4x HBM read traffic at the default hop).

Strategy (generalized hop decomposition): pick a row width
``w = lcm(hop, 128)`` (the 128-lane DMA alignment unit) and view the signal
as overlapping rows ``row[r] = x[r*hop : r*hop + w]``; frame ``t``'s chunk
``c`` (of ``ceil(n_fft/w)`` chunks, the basis zero-padded to ``n_chunks*w``
columns) is row ``t + c*q`` where ``q = w//hop``. When ``hop % 128 == 0``
the rows don't overlap and the repack is a free reshape; otherwise an
O(q·L) strided copy extends the fused envelope to speech hops (160/320) and
CQT-pyramid lower octaves (256/128/64/32). Grid is
``(batch_blocks, time_tiles, freq_tiles)`` with the frequency axis innermost:

- the ``(bb, slab_rows, w)`` signal slab covering ``bb`` batch items' time
  tile is DMA'd manually from HBM into persistent VMEM scratch **once per
  (batch-block, time tile)** (slabs of neighbouring tiles overlap, which
  BlockSpec block indexing cannot express), and a ``(bb, tile_t,
  n_chunks*w)`` frame block is assembled from it right there — the
  sublane-misaligned chunk shifts happen once per time tile. (The round-1
  kernel re-sliced the slab inside every frequency step; those per-step VPU
  shift passes, not the MXU or HBM, capped fast mode at ~44% of this chip's
  measured matmul peak — measured, batch-blocking the basis stream alone
  moved it only 25.7 -> 27 TFLOP/s, the frame block moved it to 34.4);
- the transposed bases stream through BlockSpec-managed
  ``(n_chunks*w, tile_f)`` VMEM blocks (auto double-buffered by the
  pipeline); each frequency step is then pure aligned MXU work over the
  resident frame block — no frame matrix ever exists in HBM;
- fast (bf16) mode stores slab and bases in bf16: the MXU's DEFAULT
  precision rounds fp32 operands to bf16 anyway, so this halves HBM/VMEM
  traffic at identical numerics;
- outputs are written transposed (``(tile_f, tile_t)`` blocks) so the kernel
  emits the API's (B, F, T) layout directly — no post-kernel transpose pass
  over the full spectrogram.

The supported() gate keeps every resident buffer within the VMEM budget;
outside the envelope the dispatcher falls back to the XLA hop-decomposition
path (ops/dispatch.py).
"""
from __future__ import annotations

import contextlib
import contextvars
import functools
import math

import jax
import jax.numpy as jnp

_INTERPRET = False  # flipped by tests to exercise the kernel on CPU

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom below the ~16MB/core VMEM
# HIGHEST needs a tighter plan budget: the fp32-emulation passes allocate
# scoped stack temporaries (~6MB at tile_t=432) the bill below can't see
# (measured: pair@tile_t=432 needs 16.2MB scoped vs a 10.4MB bill).
_VMEM_BUDGET_HIGHEST = 10 * 1024 * 1024

#: lcm-repack envelope limit: q = lcm(hop, 128)/hop phases must recombine in
#: one cheap XLA pass; past 8 the repack cost outweighs fusion (measured).
_MAX_Q = 8


def hop_envelope(hop: int, n_fft: int) -> tuple[int, int, int]:
    """The lcm-repack decomposition shared by the analysis/synthesis kernels
    and the dispatch auto-fuse policy: ``w`` = lcm(hop, 128) (slab row
    width), ``q`` = w//hop (overlapping row phases), ``n_chunks`` =
    ceil(n_fft/w) (K chunks per frame). One definition keeps the policy
    (ops/dispatch.py) and the kernels' envelope gates in lockstep."""
    w = hop * 128 // math.gcd(hop, 128)
    return w, w // hop, -(-n_fft // w)


def _plan(b, n_fft, f, t_total, hop, highest, n_out=1, n_mels=0):
    """Choose (w, q, n_chunks, tile_t, tile_f, bb, slab_rows) so every
    resident buffer fits the VMEM budget. Returns None when impossible.

    f128 tiles win at both precisions (+8% at HIGHEST vs f256, minimal
    padding waste: 1025 bins pad to 1152 not 1536); t512 with the largest
    batch block bb that fits minimizes basis re-streaming."""
    if hop <= 0:
        return None
    w, q, n_chunks = hop_envelope(hop, n_fft)
    if q > _MAX_Q:  # lcm blowup (odd/unaligned hops): repack outweighs fusion
        return None
    tile_f = min(128, -(-f // 128) * 128)
    ebytes = 4 if highest else 2
    mpad = n_mels + (-n_mels % 128) if n_mels else 0
    # single-f-tile grids (F <= 128, e.g. CQT banks) keep a constant basis
    # block index, which Pallas single-buffers (observed empirically) —
    # halves the basis bill and lets giant-kernel CQTs (n_chunks*w ~ 12k)
    # stay fused in fast mode
    f_tiles = (f + (-f % tile_f)) // tile_f
    basis_buf = 1 if f_tiles == 1 else 2
    for tile_t in (512, 256, 128):
        tile_t = min(tile_t, -(-t_total // 8) * 8)
        for bb in (8, 4, 2, 1):
            if b % bb:
                continue
            if bb * n_chunks > 64:  # unrolled-dot compile blowup guard
                continue
            slab_rows = -(-(tile_t + (n_chunks - 1) * q) // 8) * 8
            slab = bb * slab_rows * w * ebytes
            frame = bb * tile_t * (n_chunks * w) * ebytes
            bases = 2 * basis_buf * (n_chunks * w) * tile_f * ebytes
            outs = 2 * n_out * bb * tile_t * tile_f * 4
            extra = 0
            if n_mels:
                # fb blocks (double-buffered) + resident acc scratch + out
                extra = (2 * tile_f * mpad * ebytes
                         + 2 * bb * tile_t * mpad * 4)
                outs = 0  # the fb output replaces the pair outputs
            budget = _VMEM_BUDGET_HIGHEST if highest else _VMEM_BUDGET
            if not highest and f_tiles == 1 and n_chunks >= 16:
                # giant single-bank case (CQT wavelets, n_fft ~16k): no
                # multi-tile churn, bf16 (no emulation stack) — the extra
                # ~1.5MB headroom is safe and keeps the bank fused
                budget = int(13.5 * 1024 * 1024)
            if highest and n_out >= 2:
                # each extra output adds ~1MB of store/transpose stack the
                # bill can't see (measured 16.2MB scoped vs 10.4MB billed
                # for the pair kernel)
                budget -= 1024 * 1024 * (n_out - 1)
            if slab + frame + bases + outs + extra <= budget:
                return dict(w=w, q=q, n_chunks=n_chunks, tile_t=tile_t,
                            tile_f=tile_f, bb=bb, slab_rows=slab_rows)
    return None


def _repack(x, hop, w, rows):
    """(B, L) signal -> (B, rows, w) row view, row r = x[r*hop : r*hop+w].

    w == hop (hop % 128 == 0): a free reshape. Otherwise rows overlap by
    w - hop samples; built from q = w//hop phase-strided reshapes + one
    interleaving copy (O(q*L) HBM traffic — still tiny next to the matmul)."""
    b, length = x.shape
    q = w // hop
    if q == 1:
        need = rows * w
        if need > length:
            x = jnp.pad(x, ((0, 0), (0, need - length)))
        return x[:, :need].reshape(b, rows, w)
    m = -(-rows // q)
    need = (q - 1) * hop + m * w
    if need > length:
        x = jnp.pad(x, ((0, 0), (0, need - length)))
    x = x[:, :need]
    parts = [
        jax.lax.dynamic_slice_in_dim(x, p * hop, m * w, 1).reshape(b, m, w)
        for p in range(q)
    ]
    return jnp.stack(parts, axis=2).reshape(b, m * q, w)[:, :rows]


def _build_frames(x_hbm, slab, frame, sem, i, j, *, bb, tile_t, w, q,
                  n_chunks):
    """Once per (batch-block, time tile): DMA the aligned row slab from HBM,
    then assemble the (bb, tile_t, n_chunks*w) frame block in VMEM. The
    sublane-misaligned chunk shifts (offsets c*q) happen HERE, once — the
    round-1 kernel re-sliced the slab inside every frequency step, and those
    VPU shift passes (not the MXU) were the throughput cap."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * bb, bb), pl.ds(j * tile_t, slab.shape[1]), :],
        slab, sem,
    )
    dma.start()
    dma.wait()
    for u in range(bb):
        for c in range(n_chunks):
            frame[u, :, c * w : (c + 1) * w] = slab[u, c * q : c * q + tile_t, :]


def _frame_dots(frame, wcos_ref, wsin_ref, u, *, w, n_chunks, tile_t, prec):
    """(tile_t, tile_f) real/imag projections of frame block u.

    bf16 fast mode: one whole-K dot per basis (measured fastest: 34 vs 32
    TFLOP/s chunked). HIGHEST: K split at chunk (w) granularity — the frame
    slices are lane-aligned (offsets are multiples of w >= 128) so the split
    costs no VPU shifts, and it bounds the fp32-emulation stack temporaries
    a single K=n_chunks*w dot allocates (observed 22MB scoped-vmem OOM)."""
    if prec != jax.lax.Precision.HIGHEST:
        real = jnp.dot(frame[u], wcos_ref[...],
                       preferred_element_type=jnp.float32, precision=prec)
        imag = jnp.dot(frame[u], wsin_ref[...],
                       preferred_element_type=jnp.float32, precision=prec)
        return real, imag
    real = jnp.zeros((tile_t, wcos_ref.shape[1]), jnp.float32)
    imag = jnp.zeros((tile_t, wsin_ref.shape[1]), jnp.float32)
    for c in range(n_chunks):
        chunk = frame[u, :, c * w : (c + 1) * w]
        real = real + jnp.dot(chunk, wcos_ref[c * w : (c + 1) * w, :],
                              preferred_element_type=jnp.float32,
                              precision=prec)
        imag = imag + jnp.dot(chunk, wsin_ref[c * w : (c + 1) * w, :],
                              preferred_element_type=jnp.float32,
                              precision=prec)
    return real, imag


def _pair_kernel(x_hbm, wcos_ref, wsin_ref, real_ref, imag_ref, slab, frame,
                 sem, *, w, q, n_chunks, tile_t, bb, prec):
    from jax.experimental import pallas as pl

    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _load():
        _build_frames(x_hbm, slab, frame, sem, i, j, bb=bb, tile_t=tile_t,
                      w=w, q=q, n_chunks=n_chunks)

    for u in range(bb):
        real, imag = _frame_dots(frame, wcos_ref, wsin_ref, u, w=w,
                                 n_chunks=n_chunks, tile_t=tile_t, prec=prec)
        real_ref[u, :, :] = real.T
        imag_ref[u, :, :] = imag.T


# A fused stacked-Complex kernel (interleaved (real*s, -imag*s) lane tiles,
# so the (B, F, T, 2) view would be a free reshape) was built and measured in
# round 3 — and REMOVED, twice over:
# - Mosaic cannot lower the interleave: `stack(-1) + reshape (f,t,2)->(f,2t)`
#   fails with "infer-vector-layout: unsupported shape cast", and stride-2
#   minor-dim stores (`out_ref[:, ::2]`) fail in apply-vector-layout.
# - It would not pay anyway: XLA already fuses the stack/negate/scale
#   epilogue into the hop-decomposition matmuls for free. Measured at the
#   headline config (n_fft=2048, hop=512, B=32x10s): HIGHEST pair 44.0k /
#   pair+stack 43.9k / pair+stack+scale 44.0k audio-s/s (== the fused Pallas
#   magnitude kernel, 44.1k); fast pair 83.7k / pair+stack 83.1k (Pallas
#   magnitude 81.2k). The Pallas *pair* is strictly slower (37.9k HIGHEST /
#   79.0k fast). Complex output is dot-bound and already at kernel speed —
#   see ops/dispatch.py framed_complex.


def _gl_step_kernel(x_hbm, wcos_ref, wsin_ref, s_ref, pre_ref, pim_ref,
                    cre_ref, cim_ref, rre_ref, rim_ref, slab, frame, sem,
                    *, w, q, n_chunks, tile_t, bb, prec, mom):
    """One fused Griffin-Lim analysis step: frame + DFT pair + momentum +
    magnitude-normalize + S-scale, all in VMEM (griffin_lim.py loop body;
    reference griffin_lim.py:105-137). Emits the next loop carries
    directly: ``c = S * n / |n|`` with ``n = r - mom * p`` (``r`` the fresh
    analysis, ``p`` the previous one) plus ``r`` itself — the XLA chain
    between the pair matmuls and the carries (measured 0.64 ms/iter, 18%
    of the GL iteration, NOT auto-fused by XLA) disappears."""
    from jax.experimental import pallas as pl

    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _load():
        _build_frames(x_hbm, slab, frame, sem, i, j, bb=bb, tile_t=tile_t,
                      w=w, q=q, n_chunks=n_chunks)

    for u in range(bb):
        real, imag = _frame_dots(frame, wcos_ref, wsin_ref, u, w=w,
                                 n_chunks=n_chunks, tile_t=tile_t, prec=prec)
        r_re = real.T
        r_im = -imag.T  # reference sign convention (stft.py:309-311)
        n_re = r_re - mom * pre_ref[u].astype(jnp.float32)
        n_im = r_im - mom * pim_ref[u].astype(jnp.float32)
        scale = s_ref[u].astype(jnp.float32) * jax.lax.rsqrt(
            n_re * n_re + n_im * n_im + 1e-32)
        cre_ref[u, :, :] = (n_re * scale).astype(cre_ref.dtype)
        cim_ref[u, :, :] = (n_im * scale).astype(cim_ref.dtype)
        rre_ref[u, :, :] = r_re.astype(rre_ref.dtype)
        rim_ref[u, :, :] = r_im.astype(rim_ref.dtype)


def _magnitude_kernel(x_hbm, wcos_ref, wsin_ref, out_ref, slab, frame, sem,
                      *, w, q, n_chunks, tile_t, bb, prec, eps, square):
    """Frame+matmul+magnitude in one pass: the (B, F, T) real/imag pair never
    leaves HBM — saves its round-trip plus a separate elementwise kernel
    (~30% of the STFT magnitude wall time at the headline config)."""
    from jax.experimental import pallas as pl

    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(k == 0)
    def _load():
        _build_frames(x_hbm, slab, frame, sem, i, j, bb=bb, tile_t=tile_t,
                      w=w, q=q, n_chunks=n_chunks)

    for u in range(bb):
        real, imag = _frame_dots(frame, wcos_ref, wsin_ref, u, w=w,
                                 n_chunks=n_chunks, tile_t=tile_t, prec=prec)
        power = real * real + imag * imag
        if eps:
            power = power + eps
        out_ref[u, :, :] = (power if square else jnp.sqrt(power)).T


def _filterbank_kernel(x_hbm, wcos_ref, wsin_ref, fb_ref, out_ref, slab,
                       frame, acc, sem, *, w, q, n_chunks, tile_t, bb, prec,
                       eps):
    """Frame+matmul+power+filterbank in one pass: MelSpectrogram (or any
    ``fb @ |STFT|^2`` composite) without the (B, F, T) spectrogram ever
    existing. The accumulator scratch is resident over the frequency grid
    axis, accumulating ``P_tile @ fb_tile`` across frequency tiles; the last
    tile stores the (B, n_mels, T)-layout result."""
    from jax.experimental import pallas as pl

    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_f_tiles = pl.num_programs(2)

    @pl.when(k == 0)
    def _load():
        _build_frames(x_hbm, slab, frame, sem, i, j, bb=bb, tile_t=tile_t,
                      w=w, q=q, n_chunks=n_chunks)
        acc[...] = jnp.zeros_like(acc)

    for u in range(bb):
        real, imag = _frame_dots(frame, wcos_ref, wsin_ref, u, w=w,
                                 n_chunks=n_chunks, tile_t=tile_t, prec=prec)
        power = real * real + imag * imag
        if eps:
            power = power + eps
        acc[u, :, :] += jnp.dot(power, fb_ref[:, :],
                                preferred_element_type=jnp.float32,
                                precision=prec)

    @pl.when(k == n_f_tiles - 1)
    def _store():
        for u in range(bb):
            out_ref[u, :, :] = acc[u, :, :].T


def _prep(x, wcos_t, wsin_t, hop, plan, highest):
    """Shared host-side packing: repack the signal into the (rows, w) view,
    pad the basis rows to n_chunks*w and columns to tile_f, pick dtypes."""
    b, length = x.shape
    n_fft, f = wcos_t.shape
    w, q, n_chunks = plan["w"], plan["q"], plan["n_chunks"]
    tile_t, tile_f = plan["tile_t"], plan["tile_f"]

    t_total = (length - n_fft) // hop + 1
    n_t_tiles = -(-t_total // tile_t)
    f_pad = -f % tile_f
    row_pad = n_chunks * w - n_fft
    if f_pad or row_pad:
        wcos_t = jnp.pad(wcos_t, ((0, row_pad), (0, f_pad)))
        wsin_t = jnp.pad(wsin_t, ((0, row_pad), (0, f_pad)))
    rows = (n_t_tiles - 1) * tile_t + plan["slab_rows"]
    x2 = _repack(x, hop, w, rows)
    # interpret mode (CPU tests): the CPU dot thunk cannot execute
    # bf16 x bf16 -> f32, so keep fp32 storage there
    dtype = jnp.float32 if (highest or _INTERPRET) else jnp.bfloat16
    return (x2.astype(dtype), wcos_t.astype(dtype), wsin_t.astype(dtype),
            t_total, n_t_tiles, f + f_pad)


@functools.partial(
    jax.jit,
    static_argnames=("hop", "w", "q", "n_chunks", "tile_t", "tile_f", "bb",
                     "slab_rows", "highest", "eps", "square", "pair"),
)
def _framed_analysis(x, wcos_t, wsin_t, hop, w, q, n_chunks, tile_t, tile_f,
                     bb, slab_rows, highest, eps=0.0, square=False,
                     pair=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = dict(w=w, q=q, n_chunks=n_chunks, tile_t=tile_t, tile_f=tile_f,
                bb=bb, slab_rows=slab_rows)
    x2, wc, ws, t_total, n_t_tiles, f_padded = _prep(
        x, wcos_t, wsin_t, hop, plan, highest)
    b = x2.shape[0]
    f = wcos_t.shape[1]
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT

    common = dict(w=w, q=q, n_chunks=n_chunks, tile_t=tile_t, bb=bb,
                  prec=prec)
    basis_spec = pl.BlockSpec((n_chunks * w, tile_f), lambda i, j, k: (0, k),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bb, tile_f, tile_t), lambda i, j, k: (i, k, j),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, f_padded, n_t_tiles * tile_t),
                                     jnp.float32)
    flops = 2 * 2 * b * t_total * f * (n_chunks * w)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(x2.size + 2 * n_chunks * w * f_padded * (b // bb)
                        + (2 if pair else 1) * b * t_total * f)
        * (4 if highest else 2),
        transcendentals=0 if pair else b * t_total * f,
    )
    operands = [x2, wc, ws]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY), basis_spec, basis_spec]
    if pair:
        kern = functools.partial(_pair_kernel, **common)
        outs = [out_shape, out_shape]
        out_specs = [out_spec, out_spec]
    else:
        kern = functools.partial(_magnitude_kernel, eps=eps, square=square,
                                 **common)
        outs = out_shape
        out_specs = out_spec
    res = pl.pallas_call(
        kern,
        grid=(b // bb, n_t_tiles, f_padded // tile_f),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=outs,
        scratch_shapes=[
            pltpu.VMEM((bb, slab_rows, w), x2.dtype),
            pltpu.VMEM((bb, tile_t, n_chunks * w), x2.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=cost,
        interpret=_INTERPRET,
    )(*operands)
    if pair:
        return res[0][:, :f, :t_total], res[1][:, :f, :t_total]
    return res[:, :f, :t_total]


@functools.partial(
    jax.jit,
    static_argnames=("hop", "w", "q", "n_chunks", "tile_t", "tile_f", "bb",
                     "slab_rows", "highest", "eps"),
)
def _framed_filterbank(x, wcos_t, wsin_t, fb_t, hop, w, q, n_chunks, tile_t,
                       tile_f, bb, slab_rows, highest, eps=0.0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = dict(w=w, q=q, n_chunks=n_chunks, tile_t=tile_t, tile_f=tile_f,
                bb=bb, slab_rows=slab_rows)
    x2, wc, ws, t_total, n_t_tiles, f_padded = _prep(
        x, wcos_t, wsin_t, hop, plan, highest)
    b = x2.shape[0]
    f = wcos_t.shape[1]
    n_mels = fb_t.shape[1]
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT

    f_pad = f_padded - f
    m_pad = -n_mels % 128
    if f_pad or m_pad:
        fb_t = jnp.pad(fb_t, ((0, f_pad), (0, m_pad)))
    m_padded = n_mels + m_pad
    fb_t = fb_t.astype(x2.dtype)

    kern = functools.partial(_filterbank_kernel, w=w, q=q, n_chunks=n_chunks,
                             tile_t=tile_t, bb=bb, prec=prec, eps=eps)
    out = pl.pallas_call(
        kern,
        grid=(b // bb, n_t_tiles, f_padded // tile_f),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_chunks * w, tile_f), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_chunks * w, tile_f), lambda i, j, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, m_padded), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, m_padded, tile_t),
                               lambda i, j, k: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_padded, n_t_tiles * tile_t),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb, slab_rows, w), x2.dtype),
            pltpu.VMEM((bb, tile_t, n_chunks * w), x2.dtype),
            pltpu.VMEM((bb, tile_t, m_padded), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_total * (n_chunks * w) * (2 * f + n_mels),
            bytes_accessed=(x2.size + 2 * n_chunks * w * f_padded * (b // bb)
                            + b * t_total * n_mels) * (4 if highest else 2),
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(x2, wc, ws, fb_t)
    return out[:, :n_mels, :t_total]


def _magnitude_kchunk_kernel(x_hbm, wcos_ref, wsin_ref, out_ref, slab, racc,
                             iacc, sem, *, w, q, kc, n_chunks, tile_t, bb,
                             prec, eps, square):
    """K-chunked magnitude kernel for single-F-tile giant banks (fp32 CQT
    wavelets, ``n_chunks*w`` up to ~16k columns): the whole-K plan's resident
    basis exceeds VMEM at 4 bytes/elt, so the K (chunk) axis streams through
    the grid's innermost dimension instead — per step one ``(kc*w, tile_f)``
    basis block arrives and ``kc`` slab slices are projected and accumulated
    into resident fp32 accumulators; the last step applies the magnitude
    epilogue and stores transposed. Chunk slices are taken straight from the
    persistent slab (each chunk is touched exactly once per (batch, time)
    tile — the round-1 per-f-tile re-slicing trap does not apply when
    f_tiles == 1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i, j, k = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _load():
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * bb, bb), pl.ds(j * tile_t, slab.shape[1]), :],
            slab, sem,
        )
        dma.start()
        dma.wait()

    for u in range(bb):
        r = jnp.zeros((tile_t, wcos_ref.shape[1]), jnp.float32)
        im = jnp.zeros((tile_t, wsin_ref.shape[1]), jnp.float32)
        for cl in range(kc):
            # chunks past n_chunks (last-step padding) hit all-zero basis
            # columns and contribute nothing — no guard needed, the slab
            # covers their row span by construction.
            # Chunk c = k*kc + cl starts at slab row c*q. Mosaic requires
            # DYNAMIC sublane starts provably 8-aligned: the plan guarantees
            # (kc*q) % 8 == 0, so the dynamic term k*(kc*q) is aligned and
            # the static residual (cl*q) % 8 is taken as a static sub-slice
            # of an 8-row-padded aligned load.
            res8 = (cl * q) % 8
            s8 = k * (kc * q) + cl * q - res8
            sup = slab[u, pl.ds(s8, tile_t + 8), :]
            chunk = sup[res8 : res8 + tile_t]
            r = r + jnp.dot(chunk, wcos_ref[cl * w : (cl + 1) * w, :],
                            preferred_element_type=jnp.float32,
                            precision=prec)
            im = im + jnp.dot(chunk, wsin_ref[cl * w : (cl + 1) * w, :],
                              preferred_element_type=jnp.float32,
                              precision=prec)

        @pl.when(k == 0)
        def _init(u=u):
            racc[u, :, :] = r
            iacc[u, :, :] = im

        @pl.when(k > 0)
        def _accum(u=u):
            racc[u, :, :] += r
            iacc[u, :, :] += im

    @pl.when(k == nk - 1)
    def _emit():
        for u in range(bb):
            power = (racc[u, :, :] * racc[u, :, :]
                     + iacc[u, :, :] * iacc[u, :, :])
            if eps:
                power = power + eps
            out_ref[u, :, :] = (power if square else jnp.sqrt(power)).T


def _plan_kchunk(b, n_fft, f, t_total, hop, highest):
    """Plan for the K-chunked single-F-tile kernel. Only reached when the
    whole-K ``_plan`` failed (giant fp32 banks)."""
    if hop <= 0 or f > 128:
        return None
    w, q, n_chunks = hop_envelope(hop, n_fft)
    if q > _MAX_Q:
        return None
    if n_chunks < 2:
        return None
    tile_f = 128
    ebytes = 4 if highest else 2
    budget = _VMEM_BUDGET_HIGHEST if highest else _VMEM_BUDGET
    # Mosaic alignment: dynamic slab starts are k*(kc*q) — provable only
    # when kc*q % 8 == 0 (static residuals handled in-kernel)
    kc0 = 8 // math.gcd(q, 8)
    for tile_t in (512, 256, 128):
        tile_t = min(tile_t, -(-t_total // 8) * 8)
        for bb in (4, 2, 1):
            if b % bb:
                continue
            for kc in (kc0, 2 * kc0, 4 * kc0):
                if kc * w > 8192 or bb * kc > 64:
                    continue
                nk = -(-n_chunks // kc)
                ncp = nk * kc
                # +8: the aligned loads over-read up to 8 rows per chunk
                slab_rows = -(-(tile_t + (ncp - 1) * q) // 8) * 8 + 8
                slab = bb * slab_rows * w * ebytes
                bases = 2 * 2 * kc * w * tile_f * ebytes
                accs = 2 * bb * tile_t * tile_f * 4
                outs = 2 * bb * tile_t * tile_f * 4
                if slab + bases + accs + outs <= budget:
                    return dict(w=w, q=q, kc=kc, n_chunks=n_chunks,
                                tile_t=tile_t, bb=bb, slab_rows=slab_rows,
                                nk=nk)
    return None


@functools.partial(
    jax.jit,
    static_argnames=("hop", "w", "q", "kc", "n_chunks", "tile_t", "bb",
                     "slab_rows", "nk", "highest", "eps", "square"),
)
def _framed_magnitude_kchunk(x, wcos_t, wsin_t, hop, w, q, kc, n_chunks,
                             tile_t, bb, slab_rows, nk, highest, eps=0.0,
                             square=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, length = x.shape
    n_fft, f = wcos_t.shape
    tile_f = 128
    t_total = (length - n_fft) // hop + 1
    n_t_tiles = -(-t_total // tile_t)
    f_pad = -f % tile_f
    row_pad = nk * kc * w - n_fft
    if f_pad or row_pad:
        wcos_t = jnp.pad(wcos_t, ((0, row_pad), (0, f_pad)))
        wsin_t = jnp.pad(wsin_t, ((0, row_pad), (0, f_pad)))
    rows = (n_t_tiles - 1) * tile_t + slab_rows
    x2 = _repack(x, hop, w, rows)
    dtype = jnp.float32 if highest else jnp.bfloat16
    x2 = x2.astype(dtype)
    wc = wcos_t.astype(dtype)
    ws = wsin_t.astype(dtype)
    prec = jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT

    kern = functools.partial(_magnitude_kchunk_kernel, w=w, q=q, kc=kc,
                             n_chunks=n_chunks, tile_t=tile_t, bb=bb,
                             prec=prec, eps=eps, square=square)
    basis_spec = pl.BlockSpec((kc * w, tile_f), lambda i, j, k: (k, 0),
                              memory_space=pltpu.VMEM)
    res = pl.pallas_call(
        kern,
        grid=(b // bb, n_t_tiles, nk),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), basis_spec, basis_spec],
        out_specs=pl.BlockSpec((bb, tile_f, tile_t),
                               lambda i, j, k: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tile_f, n_t_tiles * tile_t),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bb, slab_rows, w), x2.dtype),
            pltpu.VMEM((bb, tile_t, tile_f), jnp.float32),
            pltpu.VMEM((bb, tile_t, tile_f), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t_total * f * (n_chunks * w),
            bytes_accessed=(x2.size
                            + 2 * n_chunks * w * tile_f * (b // bb)
                            * n_t_tiles + b * t_total * f)
            * (4 if highest else 2),
            transcendentals=b * t_total * f,
        ),
        interpret=_INTERPRET,
    )(x2, wc, ws)
    return res[:, :f, :t_total]


# Mosaic kernels compile in ~60-90 s through the remote helper (vs ~2 s for
# the XLA path) and the fused win only matters when there is real work to
# amortize dispatch over. Below this many total output frames the XLA path
# is used — production-sized batches (the only place the kernel's ~1.3-2x
# matters) clear it by orders of magnitude.
_MIN_FUSED_FRAMES = 1024

# trace-time override of the workload gate (see force_fuse): None = gate
# decides; True = always fuse (steady-state streaming amortizes the Mosaic
# compile across thousands of identical steps); False = never fuse. A
# ContextVar, NOT a module global: concurrent streams (threads serving
# different fuse settings) must not race each other's traces — a wrong
# value seen during another stream's first trace would compile the wrong
# path into that stream's jit cache forever.
_FORCE_FUSE: contextvars.ContextVar[bool | None] = contextvars.ContextVar(
    "nnaudio_tpu_force_fuse", default=None
)


@contextlib.contextmanager
def force_fuse(value: bool | None):
    """Override the ``_MIN_FUSED_FRAMES`` workload gate while tracing.

    The gate exists to keep one-shot toy workloads off the slow-compiling
    Mosaic path; a steady-state stream re-runs one compiled step thousands
    of times, so ``nnaudio_tpu.streaming`` traces its step under
    ``force_fuse(True)`` when asked (``fuse=True``)."""
    token = _FORCE_FUSE.set(value)
    try:
        yield
    finally:
        _FORCE_FUSE.reset(token)


def fuse_override() -> bool | None:
    """The active :func:`force_fuse` value. Dispatch-level consumers check
    it too: streaming's ``fuse=True`` must override the *synthesis
    auto-policy* (ops/dispatch.synthesis_auto_fuse), not just the
    workload gate — otherwise a ``fuse=True`` StreamingiSTFT at an
    aligned fp32 config would silently run XLA."""
    return _FORCE_FUSE.get()


def _fuse_workload_ok(total_frames: int) -> bool:
    override = _FORCE_FUSE.get()
    if override is not None:
        return override
    return total_frames >= _MIN_FUSED_FRAMES

# K-chunked giant-bank kernel: correct (1e-7 vs XLA on chip) but measured at
# parity with XLA for fp32 giant banks — off by default, see the note in
# framed_magnitude_pallas.
_ENABLE_KCHUNK = False


def _get_plan(x, wcos, hop, highest, n_out=1, n_mels=0):
    n_fft = wcos.shape[-1]
    length = x.shape[-1]
    if not (x.dtype == jnp.float32 and x.ndim == 2 and hop > 0
            and length >= n_fft):
        return None
    t_total = (length - n_fft) // hop + 1
    if not _fuse_workload_ok(x.shape[0] * t_total):
        return None
    return _plan(x.shape[0], n_fft, wcos.shape[0], t_total, hop, highest,
                 n_out=n_out, n_mels=n_mels)


def gl_step_plan(b, length, f, n_fft, hop, highest: bool = False):
    """Plan + padded dims for the fused Griffin-Lim step, or None.

    ``length`` is the (constant across iterations) analysis-input signal
    length. The GL loop runs entirely on ``(B, f_padded, t_padded)`` carries
    — padding lives OUTSIDE the loop (zero rows/cols carry exact zeros
    through the fixed point: padded S = 0 forces padded c = 0).
    ``highest``: fp32 carries + HIGHEST dots (iter_precision='highest' GL)
    via the same chunked-K plan the analysis kernels use."""
    if not _fuse_workload_ok(b * ((length - n_fft) // hop + 1)):
        return None
    t_total = (length - n_fft) // hop + 1
    # VMEM bill: the GL kernel holds 7 (bb, tile_f, tile_t) blocks resident
    # (3 carry inputs + 4 outputs); _plan bills 2*n_out, so n_out=4 over-
    # covers at HIGHEST (fp32 blocks + emulation stack, never yet profiled
    # on chip) while the measured-good bf16 plan keeps its round-3 bill.
    plan = _plan(b, n_fft, f, t_total, hop, highest=highest,
                 n_out=4 if highest else 3)
    if plan is None:
        return None
    n_t_tiles = -(-t_total // plan["tile_t"])
    plan["t_padded"] = n_t_tiles * plan["tile_t"]
    plan["f_padded"] = f + (-f % plan["tile_f"])
    return plan


@functools.partial(
    jax.jit,
    static_argnames=("hop", "w", "q", "n_chunks", "tile_t", "tile_f", "bb",
                     "slab_rows", "t_padded", "f_padded", "mom", "highest"),
)
def _framed_gl_step(x, wcos_t, wsin_t, S, p_re, p_im, hop, w, q, n_chunks,
                    tile_t, tile_f, bb, slab_rows, t_padded, f_padded, mom,
                    highest=False):
    """One fused GL step over PRE-PADDED carries: ``S``/``p_re``/``p_im``
    are (B, f_padded, t_padded) and the outputs stay padded — no per-
    iteration pad/slice traffic inside the loop. ``highest``: fp32 carries
    + chunked-K HIGHEST dots (iter_precision='highest')."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = dict(w=w, q=q, n_chunks=n_chunks, tile_t=tile_t, tile_f=tile_f,
                bb=bb, slab_rows=slab_rows)
    x2, wc, ws, t_total, n_t_tiles, f_padded2 = _prep(
        x, wcos_t, wsin_t, hop, plan, highest=highest)
    b = x2.shape[0]
    carry = jnp.float32 if highest else jnp.bfloat16

    basis_spec = pl.BlockSpec((n_chunks * w, tile_f), lambda i, j, k: (0, k),
                              memory_space=pltpu.VMEM)

    def ft_spec():
        return pl.BlockSpec((bb, tile_f, tile_t), lambda i, j, k: (i, k, j),
                            memory_space=pltpu.VMEM)

    def out_shape(dt):
        return jax.ShapeDtypeStruct((b, f_padded, t_padded), dt)

    kern = functools.partial(
        _gl_step_kernel, w=w, q=q, n_chunks=n_chunks, tile_t=tile_t, bb=bb,
        prec=(jax.lax.Precision.HIGHEST if highest
              else jax.lax.Precision.DEFAULT), mom=mom)
    f = wcos_t.shape[1]
    return pl.pallas_call(
        kern,
        grid=(b // bb, t_padded // tile_t, f_padded // tile_f),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), basis_spec, basis_spec,
                  ft_spec(), ft_spec(), ft_spec()],
        out_specs=[ft_spec(), ft_spec(), ft_spec(), ft_spec()],
        out_shape=[out_shape(carry), out_shape(carry), out_shape(carry),
                   out_shape(carry)],
        scratch_shapes=[
            pltpu.VMEM((bb, slab_rows, w), x2.dtype),
            pltpu.VMEM((bb, tile_t, n_chunks * w), x2.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t_total * f * (n_chunks * w),
            bytes_accessed=(x2.size + 2 * n_chunks * w * f_padded * (b // bb)
                            + 7 * b * t_total * f) * (4 if highest else 2),
            transcendentals=b * t_total * f,
        ),
        interpret=_INTERPRET,
    )(x2, wc, ws, S, p_re, p_im)


def framed_matmul_pair_supported(x, wcos, hop, highest: bool = True) -> bool:
    return _get_plan(x, wcos, hop, highest, n_out=2) is not None


def framed_matmul_pair_pallas(x, wcos, wsin, hop, highest: bool = True):
    """Fused pair matmul -> ((B,F,T) real, (B,F,T) un-negated sin projection);
    returns None to signal XLA fallback outside the supported envelope."""
    plan = _get_plan(x, wcos, hop, highest, n_out=2)
    if plan is None:
        return None
    wcos_t = jnp.asarray(wcos, jnp.float32).T
    wsin_t = jnp.asarray(wsin, jnp.float32).T
    return _framed_analysis(x, wcos_t, wsin_t, hop, highest=highest,
                            pair=True, **plan)


def framed_magnitude_pallas(x, wcos, wsin, hop, highest: bool, eps: float = 0.0,
                            square: bool = False):
    """Fused |STFT| (or |STFT|^2 when ``square``); returns None when outside
    the supported envelope. Giant single-F-tile banks whose whole-K resident
    plan exceeds VMEM (fp32 CQT wavelets) fall through to the K-chunked
    streaming variant."""
    plan = _get_plan(x, wcos, hop, highest)
    if plan is not None:
        wcos_t = jnp.asarray(wcos, jnp.float32).T
        wsin_t = jnp.asarray(wsin, jnp.float32).T
        return _framed_analysis(x, wcos_t, wsin_t, hop, highest=highest,
                                eps=eps, square=square, **plan)
    if not _ENABLE_KCHUNK:
        # Measured (round 3, CQT1992v2-84 HIGHEST, interleaved runs): the
        # K-chunked kernel is at PARITY with the XLA pair+sqrt (both
        # ~44-51k audio-s/s, i.e. ~18 effective TFLOP/s incl. the 84->128
        # lane padding — above the fused headline kernel's 16.4). A
        # W-stationary (F-on-sublanes, A@B^T) orientation also measured
        # parity (51.6k): the rhs-transpose relayout eats the M-dim
        # savings. With no win to amortize its ~60-90s Mosaic compile,
        # XLA keeps the giant-bank HIGHEST dispatch; the kernel stays
        # available for future chips/toolchains.
        return None
    n_fft = wcos.shape[-1]
    length = x.shape[-1]
    if not (x.dtype == jnp.float32 and x.ndim == 2 and hop > 0
            and length >= n_fft):
        return None
    t_total = (length - n_fft) // hop + 1
    if not _fuse_workload_ok(x.shape[0] * t_total):
        return None
    kplan = _plan_kchunk(x.shape[0], n_fft, wcos.shape[0], t_total, hop,
                         highest)
    if kplan is None:
        return None
    wcos_t = jnp.asarray(wcos, jnp.float32).T
    wsin_t = jnp.asarray(wsin, jnp.float32).T
    return _framed_magnitude_kchunk(x, wcos_t, wsin_t, hop, highest=highest,
                                    eps=eps, square=square, **kplan)


def framed_filterbank_pallas(x, wcos, wsin, fb, hop, highest: bool,
                             eps: float = 0.0):
    """Fused ``fb @ |STFT|^2``; returns None outside the supported envelope."""
    plan = _get_plan(x, wcos, hop, highest, n_mels=fb.shape[0])
    if plan is None:
        return None
    wcos_t = jnp.asarray(wcos, jnp.float32).T
    wsin_t = jnp.asarray(wsin, jnp.float32).T
    fb_t = jnp.asarray(fb, jnp.float32).T
    return _framed_filterbank(x, wcos_t, wsin_t, fb_t, hop, highest=highest,
                              eps=eps, **plan)


def _synthesis_ola_kernel(
    sre_hbm, sim_hbm, kc_ref, ks_ref, main_ref, tail_ref, fblk, slab_re,
    slab_im, sem, *, w, q, n_chunks, tail_rows, tile_r, prec
):
    """Synthesis matmul + overlap-add in one pass (iSTFT hot path).

    Mirrors the analysis kernels' frame-block structure in reverse, on the
    same generalized row decomposition (``w = lcm(hop, 128)``,
    ``q = w//hop``): output row ``r`` is the width-``w`` window starting at
    sample ``r*hop``, and frame ``t``'s chunk ``c`` (of the kernel bank
    zero-padded to ``n_chunks*w`` columns) lands in row ``t + c*q`` — the
    exact adjoint of the analysis ``_repack`` indexing, so any hop in the
    analysis envelope fuses here too (speech 160/320, pyramid octaves).

    The frequency axis streams through the grid's innermost dimension,
    building the (tile_r, n_chunks*w) frame block for frames
    [j*tile_r, (j+1)*tile_r) via one transposed MXU matmul per basis per
    step. At the LAST frequency step the overlap-add collapses the block:
    row contributions within the tile go to the main output; the
    ``(n_chunks-1)*q`` boundary rows that spill into the next tile go to a
    small ``tail`` output, added back by the caller with one cheap XLA op.
    For ``q > 1`` the caller then combines the q overlapping row phases
    (adjoint of the analysis repack). The (B, T, n_fft) frame tensor never
    exists in HBM, and the sublane-misaligned OLA shifts happen once per
    row tile. When the whole (bf16) kernel bank fits VMEM the grid has one
    frequency step and the frame block accumulator is skipped entirely.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    n_f_tiles = pl.num_programs(2)
    tile_f = slab_re.shape[0]

    dma_re = pltpu.make_async_copy(
        sre_hbm.at[i, pl.ds(k * tile_f, tile_f), pl.ds(j * tile_r, tile_r)],
        slab_re, sem,
    )
    dma_re.start()
    dma_re.wait()
    dma_im = pltpu.make_async_copy(
        sim_hbm.at[i, pl.ds(k * tile_f, tile_f), pl.ds(j * tile_r, tile_r)],
        slab_im, sem,
    )
    dma_im.start()
    dma_im.wait()

    # frames[t] = kc^T sre[:, t] - ks^T sim[:, t]:
    # dot_general contracts dim 0 of both operands -> (tile_r, n_chunks*w)
    dn = (((0,), (0,)), ((), ()))
    acc = jax.lax.dot_general(slab_re[...], kc_ref[...], dn,
                              preferred_element_type=jnp.float32,
                              precision=prec)
    acc = acc - jax.lax.dot_general(slab_im[...], ks_ref[...], dn,
                                    preferred_element_type=jnp.float32,
                                    precision=prec)

    def emit(frames):
        # main rows: row j*tile_r + rr sums frames[rr - c*q] chunk c
        o = jnp.zeros((tile_r, w), jnp.float32)
        for c in range(n_chunks):
            s = c * q
            part = frames[: tile_r - s, c * w : (c + 1) * w]
            o = o + (part if s == 0 else jnp.pad(part, ((s, 0), (0, 0))))
        main_ref[0, :, :] = o
        # tail rows rr in [0, (n_chunks-1)*q): contributions of this tile's
        # last frames to the NEXT tile's first rows:
        # sum_{c: c*q > rr} frames[tile_r + rr - c*q] chunk c
        if n_chunks > 1:
            tl = jnp.zeros((tail_rows, w), jnp.float32)
            for c in range(1, n_chunks):
                s = c * q
                part = frames[tile_r - s :, c * w : (c + 1) * w]
                tl = tl + jnp.pad(part, ((0, tail_rows - s), (0, 0)))
            tail_ref[0, :, :] = tl

    if n_f_tiles == 1:
        emit(acc)
    else:
        @pl.when(k == 0)
        def _init():
            fblk[...] = acc

        @pl.when(k > 0)
        def _accum():
            fblk[...] += acc

        @pl.when(k == n_f_tiles - 1)
        def _emit():
            emit(fblk[...])


@functools.partial(
    jax.jit, static_argnames=("hop", "w", "q", "n_chunks", "tail_rows",
                              "tile_r", "tile_f", "highest")
)
def _synthesis_ola(spec_re, spec_im, kc_t, ks_t, hop, w, q, n_chunks,
                   tail_rows, tile_r, tile_f, highest):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f, t = spec_re.shape
    n_fft = kc_t.shape[1]
    kpad = n_chunks * w
    if kpad > n_fft:
        # zero kernel columns beyond n_fft contribute nothing
        kc_t = jnp.pad(kc_t, ((0, 0), (0, kpad - n_fft)))
        ks_t = jnp.pad(ks_t, ((0, 0), (0, kpad - n_fft)))
    # row r covers samples [r*hop, r*hop + w); frame t chunk c -> row t+c*q
    rows = t + (n_chunks - 1) * q

    n_r_tiles = -(-rows // tile_r)
    t_pad = n_r_tiles * tile_r - t
    spec_re = jnp.pad(spec_re, ((0, 0), (0, 0), (0, t_pad)))
    spec_im = jnp.pad(spec_im, ((0, 0), (0, 0), (0, t_pad)))

    f_pad = -f % tile_f
    if f_pad:
        spec_re = jnp.pad(spec_re, ((0, 0), (0, f_pad), (0, 0)))
        spec_im = jnp.pad(spec_im, ((0, 0), (0, f_pad), (0, 0)))
        kc_t = jnp.pad(kc_t, ((0, f_pad), (0, 0)))
        ks_t = jnp.pad(ks_t, ((0, f_pad), (0, 0)))
    f_padded = f + f_pad

    dtype = jnp.float32 if highest else jnp.bfloat16
    spec_re = spec_re.astype(dtype)
    spec_im = spec_im.astype(dtype)
    kc_t = kc_t.astype(dtype)
    ks_t = ks_t.astype(dtype)

    prec = (jax.lax.Precision.HIGHEST if highest else jax.lax.Precision.DEFAULT)
    kern = functools.partial(
        _synthesis_ola_kernel, w=w, q=q, n_chunks=n_chunks,
        tail_rows=tail_rows, tile_r=tile_r, prec=prec,
    )
    single = f_padded // tile_f == 1
    main, tail = pl.pallas_call(
        kern,
        grid=(b, n_r_tiles, f_padded // tile_f),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tile_f, kpad), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_f, kpad), lambda i, j, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r, w), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tail_rows, w), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_r_tiles * tile_r, w), jnp.float32),
            jax.ShapeDtypeStruct((b, n_r_tiles * tail_rows, w), jnp.float32),
        ],
        scratch_shapes=[
            # single-f-tile mode never touches the frame-block accumulator
            pltpu.VMEM((8, 128) if single else (tile_r, kpad), jnp.float32),
            pltpu.VMEM((tile_f, tile_r), dtype),
            pltpu.VMEM((tile_f, tile_r), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * t * f * n_fft,
            bytes_accessed=(2 * b * f_padded * t + 2 * f_padded * kpad
                            * n_r_tiles * b + b * rows * w)
            * (4 if highest else 2),
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(spec_re, spec_im, kc_t, ks_t)
    boundary = (n_chunks - 1) * q
    if boundary:
        # fold each tile's boundary rows into the next tile's first rows
        main = main.reshape(b, n_r_tiles, tile_r, w)
        tail = tail.reshape(b, n_r_tiles, tail_rows, w)
        main = main.at[:, 1:, :boundary, :].add(tail[:, :-1, :boundary, :])
        main = main.reshape(b, n_r_tiles * tile_r, w)
    else:
        main = main.reshape(b, n_r_tiles * tile_r, w)
    # the API contract length; samples beyond it come only from the zero
    # kernel-pad columns
    length = n_fft + hop * (t - 1)
    if q == 1:
        return main.reshape(b, -1)[:, :length]
    # q > 1: rows overlap by w - hop samples — combine the q phases
    # (adjoint of the analysis _repack): rows r ≡ p (mod q) tile the line
    # [p*hop, ...) in non-overlapping width-w segments
    main = main[:, :rows]  # drop row-tile padding
    m = -(-rows // q)
    out = jnp.zeros((b, (q - 1) * hop + m * w), jnp.float32)
    for p in range(q):
        seg = main[:, p::q, :]
        mp = seg.shape[1]
        out = out.at[:, p * hop : p * hop + mp * w].add(
            seg.reshape(b, mp * w))
    return out[:, :length]


def synthesis_ola_pallas(spec_re, spec_im, kc, ks, hop, highest: bool):
    """Fused iSTFT synthesis+OLA. ``kc``/``ks``: (F, n_fft) kernels with the
    window, 1/n_fft and Hermitian fold weights pre-applied.
    Returns (B, n_fft + hop*(T-1)) un-normalized signal, or None when the
    configuration is outside the kernel envelope (same generalized envelope
    as the analysis kernels: any hop with ``lcm(hop, 128)/hop <= 8``)."""
    n_fft = kc.shape[1]
    # bf16 spectra are accepted in the bf16 kernel mode (the kernel stores
    # operands bf16 anyway — Griffin-Lim's bf16 loop carries feed directly)
    ok_dtype = (spec_re.dtype == jnp.float32
                or (not highest and spec_re.dtype == jnp.bfloat16))
    if not (hop > 0 and ok_dtype):
        return None
    w, q, n_chunks = hop_envelope(hop, n_fft)
    if q > _MAX_Q:  # lcm blowup (odd/unaligned hops)
        return None
    boundary = (n_chunks - 1) * q
    tail_rows = max(8, -(-boundary // 8) * 8)
    if not _fuse_workload_ok(spec_re.shape[0] * spec_re.shape[2]):
        return None  # see _MIN_FUSED_FRAMES: XLA compiles 40x faster
    f = kc.shape[0]
    kpad = n_chunks * w
    ebytes = 4 if highest else 2
    budget = _VMEM_BUDGET_HIGHEST if highest else _VMEM_BUDGET
    f_padded = f + (-f % 128)
    candidates = []
    if not highest:
        # full-F single step: bf16 kernel banks resident, no frame-block
        # accumulator round-trips (measured fastest when it fits)
        candidates += [(tile_r, f_padded) for tile_r in (256, 128)]
    candidates += [(tile_r, min(128, -(-f // 8) * 8))
                   for tile_r in (256, 128)]
    for tile_r, tile_f in candidates:
        if tile_r <= boundary:  # a tile's spill must fit the next tile
            continue
        single = tile_f == f_padded
        fblk = 0 if single else tile_r * kpad * 4
        # kernel-bank blocks: double-buffered unless the index map is
        # constant (single f tile — Pallas elides the second buffer)
        kernels = (2 if single else 4) * tile_f * kpad * ebytes
        slabs = 2 * tile_f * tile_r * ebytes
        outs = 2 * (tile_r + tail_rows) * w * 4
        if fblk + kernels + slabs + outs <= budget:
            return _synthesis_ola(spec_re, spec_im,
                                  jnp.asarray(kc, jnp.float32),
                                  jnp.asarray(ks, jnp.float32), hop, w, q,
                                  n_chunks, tail_rows, tile_r, tile_f,
                                  highest)
    return None
