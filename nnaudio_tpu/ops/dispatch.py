"""Backend dispatch for the framed basis-pair contraction (the hot op).

Implementations, all computing ``Y[b,f,t] = sum_s x[b, t*hop+s] * W[f,s]``
for the cos/sin bases:

- **Hop-decomposition einsum** (default for the separate real/imag pair):
  view x as (rows, hop) and accumulate ``n_fft/hop`` chunked matmuls — no
  frame materialization, minimal HBM traffic. Honest v5e measurements at
  n_fft=2048/hop=512 with the full output consumed (beware: benchmarks whose
  only consumer is one output element get silently DCE-shrunk by XLA):
  hopdec 16.4 TFLOP/s fp32-HIGHEST / 33.2 fast-mode, gather+matmul
  12.9/20.4, `conv_general_dilated` 3.3/7.4 (TPU conv+consumer fusion is
  pathologically slow and ignores optimization_barrier). The round-2 Pallas
  pair kernel with transposed stores reaches ~31-33 fast / 14 HIGHEST —
  parity at best, so XLA keeps the pair; Pallas wins only with a fused
  epilogue (magnitude 34.4 fast / 16.4 HIGHEST, see framed_matmul.py).
- **Gather einsum** fallback when hop doesn't divide n_fft or the chunk count
  exceeds 32 (deep CQT-pyramid octaves with tiny hops, where the unrolled
  chunk graph compiles slower than the gather runs).
- **Pallas fused kernels**: frame-block scratch + matmul with
  magnitude/power/filterbank epilogues fused in VMEM (ops/framed_matmul.py).
  Dispatched by the measured shape/precision auto policy
  (:func:`analysis_auto_fuse`, round-5 device-true data): fast-mode
  128-aligned hops and small divisor hops fuse; fp32-HIGHEST aligned and
  all misaligned (q > 1) hops run the XLA chain, which caught up when
  ``core.frame.frame_signal`` stopped gathering (round 5).

The op carries a custom VJP so trainable bases differentiate identically
through every backend (frame-weighted outer products for dW, overlap
scatter-add for dx).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import dot_precision, get_config, on_tpu
from ..core.apply import apply_basis
from ..core.frame import frame_signal, frames_to_signal


def _xla_pair(x, wcos, wsin, hop):
    n_fft = wcos.shape[-1]
    # hop-decomposition emits n_fft/hop chunked matmuls; past ~32 chunks
    # (deep CQT-pyramid octaves with tiny hops) the unrolled graph compiles
    # slower than the frame path runs. Below hop=128 each chunk is a
    # skinny-K (K = hop) einsum that collapses on the MXU — the slice-phase
    # frame path + one full-width matmul wins 1.5-7.2x there despite its
    # (n_fft/hop)x HBM read amplification (round-5 device-true A/B,
    # tools/profile_r5_pair_smallhop.py: 512/64 fast 1.05 vs 5.05 ms,
    # 1024/64 fast 2.85 vs 20.6, 512/32 HIGHEST 9.8 vs 22.5).
    if n_fft % hop == 0 and hop >= 128 and n_fft // hop <= 32:
        # gather-free hop-decomposition: view x as (rows, hop); frame t is
        # rows t..t+n_fft/hop-1, so Y = sum_c x2[:, c:c+T] @ W[:, c*hop:(c+1)*hop]^T.
        b, length = x.shape
        t_total = (length - n_fft) // hop + 1
        n_chunks = n_fft // hop
        rows = t_total + n_chunks - 1
        need = rows * hop
        if need > length:
            x = jnp.pad(x, ((0, 0), (0, need - length)))
        x2 = x[:, :need].reshape(b, rows, hop)
        prec = dot_precision()
        real = jnp.zeros((b, wcos.shape[0], t_total), jnp.float32)
        imag = jnp.zeros((b, wsin.shape[0], t_total), jnp.float32)
        for c in range(n_chunks):
            chunk = x2[:, c : c + t_total, :]  # (B, T, hop)
            wc = wcos[:, c * hop : (c + 1) * hop]
            ws = wsin[:, c * hop : (c + 1) * hop]
            real = real + jnp.einsum("bth,fh->bft", chunk, wc, precision=prec,
                                     preferred_element_type=jnp.float32)
            imag = imag + jnp.einsum("bth,fh->bft", chunk, ws, precision=prec,
                                     preferred_element_type=jnp.float32)
        return real, imag
    frames = frame_signal(x, n_fft, hop)  # (B, T, n_fft)
    return apply_basis(frames, wcos), apply_basis(frames, wsin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def framed_basis_pair(x, wcos, wsin, hop):
    """STFT core: signal (B, L) × bases (F, n_fft) -> two (B, F, T) maps.

    Returns (real, imag_raw) where ``imag_raw`` is the *un-negated* sin
    projection, matching the reference conv1d pair (stft.py:290-293).
    """
    # the XLA hop-decomposition einsum matches the round-2 Pallas pair
    # kernel for separate real/imag outputs (33.2 vs 31-33 TFLOP/s fast,
    # 16.4 vs ~14 HIGHEST — see the module docstring) — Pallas pays off
    # only when an epilogue is fused (see framed_magnitude / complex_stack)
    return _xla_pair(x, wcos, wsin, hop)


def analysis_auto_fuse(hop: int, n_fft: int, matmul_precision: str) -> bool:
    """Auto policy for the fused analysis kernels (magnitude / power /
    filterbank epilogues). Round-5 device-true measurements
    (tools/profile_r5_dispatch.py, floor-corrected; the earlier rounds'
    "Pallas 1.25x at HIGHEST" was tunnel-floor-damped AND predates the
    round-5 ``frame_signal`` slice-phase fix that sped the XLA chain up):

    - 128-aligned hops (q == 1): the kernel wins in fast (bf16) mode only
      (1.16-1.5x at 2048/512 and 1024/256; Mel composite 1.3x); at
      fp32-HIGHEST XLA is at parity at the headline and 1.4x ahead at
      1024/256 (the kernel pays lane padding on F, e.g. 513 -> 640).
    - misaligned hops (q > 1, e.g. 160/320): XLA's slice-phase framing +
      one big matmul wins at BOTH precisions (1.4-5.9x) — the kernel pays
      the lcm repack plus K padding (n_chunks*w > n_fft).
    - small divisor hops (hop < 128 dividing n_fft, e.g. 512/64): the
      kernel wins 1.5-6.9x over the skinny-K (K = hop) chunked einsum,
      which collapses on the MXU. (``_xla_pair`` now routes hop < 128 to
      the frame path instead — tools/profile_r5_pair_smallhop.py — which
      closes most of that gap for the pair consumers; the kernel still
      measures parity-to-1.14x over it and avoids the frame tensor's
      (n_fft/hop)x HBM footprint, so it keeps the dispatch here.)
    """
    from .framed_matmul import hop_envelope

    _, q, _ = hop_envelope(hop, n_fft)
    if q == 1:
        return matmul_precision == "default"
    return n_fft % hop == 0 and n_fft // hop <= 32 and hop < 128


def resolve_analysis_fuse(cfg, hop: int, n_fft: int) -> bool:
    """Whether the analysis epilogue ops take the fused Pallas path.
    Explicit config (``use_pallas_analysis``) wins; a ``force_fuse``
    context (streaming's ``fuse=True``) outranks the auto policy — the
    caller is promising a steady-state workload; otherwise the measured
    auto policy above decides."""
    if cfg.use_pallas_analysis is not None:
        return cfg.use_pallas_analysis
    from .framed_matmul import fuse_override

    forced = fuse_override()
    if forced is not None:
        return forced
    return analysis_auto_fuse(hop, n_fft, cfg.matmul_precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def framed_magnitude(x, wcos, wsin, hop, eps=0.0):
    """Fused ``sqrt((x*wcos)^2 + (x*wsin)^2 + eps)`` -> (B, F, T).

    Where the measured auto policy says so (:func:`analysis_auto_fuse`),
    this runs as a single Pallas kernel (frame + two matmul accumulations +
    magnitude epilogue) so the real/imag pair never touches HBM — 1.16-1.5x
    the XLA pipeline in fast mode at 128-aligned hops, up to 6.9x at small
    divisor hops. Elsewhere (or outside the kernel envelope) it falls back
    to the pair + elementwise magnitude, which XLA fuses."""
    cfg = get_config()
    if (on_tpu() and cfg.use_pallas
            and cfg.matmul_precision != "tensorfloat32"
            and resolve_analysis_fuse(cfg, hop, wcos.shape[-1])):
        from .framed_matmul import framed_magnitude_pallas

        out = framed_magnitude_pallas(
            x, wcos, wsin, hop,
            highest=cfg.matmul_precision == "highest", eps=eps,
        )
        if out is not None:
            return out
    real, imag = _xla_pair(x, wcos, wsin, hop)
    power = real * real + imag * imag
    if eps:
        power = power + eps
    return jnp.sqrt(power)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def framed_complex(x, wcos, wsin, scale, hop):
    """Fused reference-convention Complex stack:
    ``out[..., 0] = real * s_f``, ``out[..., 1] = -imag_raw * s_f``
    (stft.py:307-311 sign convention; ``scale`` carries e.g. the CQT librosa
    ``sqrt(lengths)`` normalization, cqt.py:766-775 — pass None for no
    scaling).

    Runs as the XLA pair + stack, which is the measured optimum: XLA fuses
    the stack/negate/scale epilogue into the hop-decomposition matmuls for
    free — pair 44.0k / pair+stack+scale 44.0k audio-s/s at HIGHEST (== the
    fused Pallas magnitude kernel, 44.1k) and 83.7k / 83.1k fast at the
    headline config. A Pallas interleaved-store complex kernel was built and
    removed: Mosaic cannot lower lane interleaves (see the round-3 note in
    framed_matmul.py), and there is nothing left to save — the op is
    dot-bound at the same rate as the best fused kernel."""
    real, imag = _xla_pair(x, wcos, wsin, hop)
    if scale is not None:
        s = scale.reshape(1, -1, 1)
        real, imag = real * s, imag * s
    return jnp.stack((real, -imag), axis=-1)


def _cplx_fwd(x, wcos, wsin, scale, hop):
    real, imag = _xla_pair(x, wcos, wsin, hop)
    if scale is not None:
        s = scale.reshape(1, -1, 1)
        out = jnp.stack((real * s, -imag * s), axis=-1)
    else:
        out = jnp.stack((real, -imag), axis=-1)
    return out, (x, wcos, wsin, scale, real, imag)


def _cplx_bwd(hop, res, g):
    x, wcos, wsin, scale, real, imag = res
    g0, g1 = g[..., 0], g[..., 1]
    if scale is not None:
        s = scale.reshape(1, -1, 1)
        d_real, d_imag = g0 * s, -g1 * s
        # out0 = real*s, out1 = -imag*s -> ds_f = sum_bt (g0*real - g1*imag)
        d_scale = (jnp.sum(g0 * real, axis=(0, 2))
                   - jnp.sum(g1 * imag, axis=(0, 2))).reshape(scale.shape)
        d_scale = d_scale.astype(scale.dtype)
    else:
        d_real, d_imag, d_scale = g0, -g1, None
    d_x, d_wcos, d_wsin = _bwd(hop, (x, wcos, wsin), (d_real, d_imag))
    return d_x, d_wcos, d_wsin, d_scale


framed_complex.defvjp(_cplx_fwd, _cplx_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def framed_power(x, wcos, wsin, hop):
    """Fused power spectrum ``(x*wcos)^2 + (x*wsin)^2`` -> (B, F, T).

    MelSpectrogram's default ``power=2.0`` squares the magnitude right after
    the sqrt — this op skips both elementwise passes entirely. Fused-vs-XLA
    dispatch follows :func:`analysis_auto_fuse`."""
    cfg = get_config()
    if (on_tpu() and cfg.use_pallas
            and cfg.matmul_precision != "tensorfloat32"
            and resolve_analysis_fuse(cfg, hop, wcos.shape[-1])):
        from .framed_matmul import framed_magnitude_pallas

        out = framed_magnitude_pallas(
            x, wcos, wsin, hop,
            highest=cfg.matmul_precision == "highest", square=True,
        )
        if out is not None:
            return out
    real, imag = _xla_pair(x, wcos, wsin, hop)
    return real * real + imag * imag


# Differentiated forwards save the real/imag pair as residuals and skip the
# fused Pallas kernel: under jax.grad the backward needs the pair anyway,
# and measured on-chip the XLA pair (shared between fwd and bwd) beats
# fused-fwd + recompute (5.6 vs 6.7 ms per value_and_grad step at the
# headline config, fast mode). Inference keeps the fused primal path —
# custom_vjp fwd rules only run under differentiation.


def _pow_fwd(x, wcos, wsin, hop):
    real, imag = _xla_pair(x, wcos, wsin, hop)
    return real * real + imag * imag, (x, wcos, wsin, real, imag)


def _pow_bwd(hop, res, g):
    x, wcos, wsin, real, imag = res
    return _bwd(hop, (x, wcos, wsin), (2 * g * real, 2 * g * imag))


framed_power.defvjp(_pow_fwd, _pow_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def framed_filterbank(x, wcos, wsin, fb, hop, eps=0.0):
    """Fused ``fb @ (|STFT|^2 + eps)`` -> (B, n_mels, T): the whole
    MelSpectrogram/Gammatonegram forward in one Pallas kernel — the
    (B, F, T) spectrogram never exists in HBM. Fused-vs-XLA dispatch
    follows :func:`analysis_auto_fuse` (fast-mode composite 1.3x XLA at
    the Mel headline; fp32-HIGHEST parity, so XLA keeps it there too)."""
    cfg = get_config()
    if (on_tpu() and cfg.use_pallas
            and cfg.matmul_precision != "tensorfloat32"
            and resolve_analysis_fuse(cfg, hop, wcos.shape[-1])):
        from .framed_matmul import framed_filterbank_pallas

        out = framed_filterbank_pallas(
            x, wcos, wsin, fb, hop,
            highest=cfg.matmul_precision == "highest", eps=eps,
        )
        if out is not None:
            return out
    real, imag = _xla_pair(x, wcos, wsin, hop)
    power = real * real + imag * imag
    if eps:
        power = power + eps
    return jnp.einsum("gf,bft->bgt", fb, power, precision=dot_precision(),
                      preferred_element_type=jnp.float32)


def _fb_fwd(x, wcos, wsin, fb, hop, eps):
    real, imag = _xla_pair(x, wcos, wsin, hop)
    power = real * real + imag * imag
    if eps:
        power = power + eps
    out = jnp.einsum("gf,bft->bgt", fb, power, precision=dot_precision(),
                     preferred_element_type=jnp.float32)
    return out, (x, wcos, wsin, fb, real, imag)


def _fb_bwd(hop, eps, res, g):
    x, wcos, wsin, fb, real, imag = res
    prec = dot_precision()
    power = real * real + imag * imag
    if eps:
        power = power + eps
    d_fb = jnp.einsum("bgt,bft->gf", g, power, precision=prec,
                      preferred_element_type=jnp.float32).astype(fb.dtype)
    d_power = jnp.einsum("gf,bgt->bft", fb, g, precision=prec,
                         preferred_element_type=jnp.float32)
    d_x, d_wcos, d_wsin = _bwd(
        hop, (x, wcos, wsin), (2 * d_power * real, 2 * d_power * imag)
    )
    return d_x, d_wcos, d_wsin, d_fb


framed_filterbank.defvjp(_fb_fwd, _fb_bwd)


def _mag_fwd(x, wcos, wsin, hop, eps):
    real, imag = _xla_pair(x, wcos, wsin, hop)
    power = real * real + imag * imag
    if eps:
        power = power + eps
    out = jnp.sqrt(power)
    return out, (x, wcos, wsin, real, imag, out)


def _mag_bwd(hop, eps, res, g):
    # d|z|/dre = re/|z| (with the +eps regularizer |z| stays bounded away
    # from 0 when eps > 0, matching the reference's trainable-mode 1e-8)
    x, wcos, wsin, real, imag, mag = res
    safe = jnp.where(mag > 0, mag, 1.0)
    scale = g / safe
    return _bwd(hop, (x, wcos, wsin), (scale * real, scale * imag))


framed_magnitude.defvjp(_mag_fwd, _mag_bwd)


def synthesis_auto_fuse(hop: int, n_fft: int, matmul_precision: str) -> bool:
    """Auto policy for the fused synthesis+OLA kernel (round-3
    measurements, batch 32):

    - fast (bf16) mode: the fused kernel always wins (73.5k vs 66.2k
      audio-s/s even at the aligned headline config);
    - fp32 modes (highest/tensorfloat32): the kernel wins only where XLA's
      scatter-OLA collapses — misaligned hops (q > 1: 56.8k vs 31.0k at
      512/160) or deep overlap (16 chunks: 9.4k vs 8.7k); at the aligned
      small-overlap headline XLA stays (46.0k vs 34.2k).
    """
    if matmul_precision == "default":
        return True
    from .framed_matmul import hop_envelope

    _, q, n_chunks = hop_envelope(hop, n_fft)
    return q > 1 or n_chunks > 9


def resolve_synthesis_fuse(cfg, hop: int, n_fft: int) -> bool:
    """Whether :func:`synthesis_ola` takes the fused Pallas path. Explicit
    config (``use_pallas_synthesis``) wins; in auto mode a
    ``force_fuse(True/False)`` context (streaming's ``fuse`` ctor arg)
    outranks the measured auto-policy — the caller is promising a
    steady-state workload the policy's one-shot data doesn't model."""
    if cfg.use_pallas_synthesis is not None:
        return cfg.use_pallas_synthesis
    from .framed_matmul import fuse_override

    forced = fuse_override()
    if forced is not None:
        return forced
    return synthesis_auto_fuse(hop, n_fft, cfg.matmul_precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def synthesis_ola(spec_re, spec_im, kc, ks, hop):
    """Fused iSTFT synthesis: (B, F, T) spectra x (F, n_fft) fully-weighted
    kernels -> (B, n_fft + hop*(T-1)) overlap-added signal, with the frame
    tensor kept in VMEM on TPU. ``kc``/``ks`` carry window, 1/n_fft and
    Hermitian-fold weights; the op computes ``OLA(kc^T Re - ks^T Im)``."""
    cfg = get_config()
    use_syn = resolve_synthesis_fuse(cfg, hop, kc.shape[1])
    if on_tpu() and cfg.use_pallas and use_syn:
        from .framed_matmul import synthesis_ola_pallas

        # fp32-path modes (highest AND tensorfloat32) use the fp32-storage
        # kernel variant: tf32 asks ~1e-4 numerics, bf16 storage delivers
        # only ~2e-3
        out = synthesis_ola_pallas(
            spec_re, spec_im, kc, ks, hop,
            highest=cfg.matmul_precision != "default",
        )
        if out is not None:
            return out
    prec = dot_precision()
    frames = jnp.einsum("fj,bft->btj", kc, spec_re, precision=prec,
                        preferred_element_type=jnp.float32)
    frames = frames - jnp.einsum("fj,bft->btj", ks, spec_im, precision=prec,
                                 preferred_element_type=jnp.float32)
    length = kc.shape[1] + hop * (spec_re.shape[-1] - 1)
    return frames_to_signal(frames, hop, length)


def _ola_fwd(spec_re, spec_im, kc, ks, hop):
    return synthesis_ola(spec_re, spec_im, kc, ks, hop), (spec_re, spec_im, kc, ks)


def _ola_bwd(hop, res, g):
    # the adjoint of synthesis+OLA is analysis: frame the cotangent signal
    # and project it onto the same kernels
    spec_re, spec_im, kc, ks = res
    prec = dot_precision()
    d_re, d_im_raw = _xla_pair(g, kc, ks, hop)
    g_frames = frame_signal(g, kc.shape[1], hop)  # (B, T, n_fft)
    d_kc = jnp.einsum("bft,btj->fj", spec_re, g_frames, precision=prec,
                      preferred_element_type=jnp.float32).astype(kc.dtype)
    d_ks = -jnp.einsum("bft,btj->fj", spec_im, g_frames, precision=prec,
                       preferred_element_type=jnp.float32).astype(ks.dtype)
    return d_re, -d_im_raw, d_kc, d_ks


synthesis_ola.defvjp(_ola_fwd, _ola_bwd)


def _fwd(x, wcos, wsin, hop):
    return framed_basis_pair(x, wcos, wsin, hop), (x, wcos, wsin)


def _bwd(hop, res, grads):
    x, wcos, wsin = res
    g_real, g_imag = grads
    prec = dot_precision()
    n_fft = wcos.shape[-1]
    b, length = x.shape
    t_total = g_real.shape[-1]

    if n_fft % hop == 0 and hop >= 128 and n_fft // hop <= 32:
        # hop-decomposition backward: neither the frame tensor nor the
        # cotangent frame tensor is materialized (a (B, T, 16384) frame
        # tensor for a trainable default CQT1992v2 would be ~900MB at B=32).
        # Below hop=128 the chunked dW einsums go skinny (N = hop) and the
        # frame-based fallback wins 1.2-1.3x (round-5 on-chip A/B, see
        # tools/profile_r5_pair_smallhop.py and the matching forward gate
        # in _xla_pair); the gated region bounds the frame tensor at
        # n_fft <= 32*hop < 4096 columns, so the memory caveat above
        # cannot trigger there.
        n_chunks = n_fft // hop
        rows = t_total + n_chunks - 1
        need = rows * hop
        xp = jnp.pad(x, ((0, 0), (0, max(0, need - length))))
        x2 = xp[:, :need].reshape(b, rows, hop)
        # dW columns for the chunks are DISJOINT: one einsum per chunk,
        # concatenated — no scatter/.at[].add accumulation passes
        d_wcos = jnp.concatenate([
            jnp.einsum("bft,bth->fh", g_real, x2[:, c : c + t_total, :],
                       precision=prec, preferred_element_type=jnp.float32)
            for c in range(n_chunks)
        ], axis=1).astype(wcos.dtype)
        d_wsin = jnp.concatenate([
            jnp.einsum("bft,bth->fh", g_imag, x2[:, c : c + t_total, :],
                       precision=prec, preferred_element_type=jnp.float32)
            for c in range(n_chunks)
        ], axis=1).astype(wsin.dtype)
        # dx is the OLA-adjoint of the cotangent spectra projected onto the
        # bases — exactly the synthesis op (which has its own fused TPU
        # kernel): frames_t = wcos^T g_real[:,t] + wsin^T g_imag[:,t]
        d_x = synthesis_ola(g_real, -g_imag, wcos, wsin, hop)
        d_x = d_x[:, :length].astype(x.dtype)
        if d_x.shape[1] < length:
            d_x = jnp.pad(d_x, ((0, 0), (0, length - d_x.shape[1])))
        return d_x, d_wcos, d_wsin

    frames = frame_signal(x, n_fft, hop)  # (B, T, N)
    d_wcos = jnp.einsum("bft,btn->fn", g_real, frames, precision=prec,
                        preferred_element_type=jnp.float32).astype(wcos.dtype)
    d_wsin = jnp.einsum("bft,btn->fn", g_imag, frames, precision=prec,
                        preferred_element_type=jnp.float32).astype(wsin.dtype)
    d_frames = jnp.einsum("bft,fn->btn", g_real, wcos, precision=prec,
                          preferred_element_type=jnp.float32)
    d_frames = d_frames + jnp.einsum("bft,fn->btn", g_imag, wsin, precision=prec,
                                     preferred_element_type=jnp.float32)
    d_x = frames_to_signal(d_frames.astype(x.dtype), hop, x.shape[-1])
    return d_x, d_wcos, d_wsin


framed_basis_pair.defvjp(_fwd, _bwd)
