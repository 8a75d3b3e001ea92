"""Kernel-bank (tensor-parallel) sharding: basis rows across the ``model`` axis.

The CQT/Fourier basis is a ``(n_bins, n_fft)`` matrix; its rows are
independent output frequency bands, so splitting rows across chips needs **no
reduction** — each chip computes its bands and the output spectrogram is
frequency-sharded (BASELINE.json north star: "oversized CQT kernel banks are
sharded over chips"). The frequency-domain CQT1992 complex matmul keeps its
contraction axis (Fourier bins) replicated, so it too is reduction-free.
"""
from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .data import shard_batch
from .mesh import replicate

# parameter names whose leading axis is an output frequency band
_BANK_PARAM_PREFIXES = (
    "wsin",
    "wcos",
    "cqt_kernels_real",
    "cqt_kernels_imag",
    # the composed time-domain bases frozen CQT1992/CQT2010 actually
    # contract (features/cqt.py: "combined_real/imag" = kernels @ fourier)
    "combined_real",
    "combined_imag",
    "mel_basis",
    "gammatone_basis",
    "chroma_basis",
)


def _param_spec(name: str, ndim: int, mesh_axis: str = "model"):
    if any(name == p or name.startswith(p + "_") for p in _BANK_PARAM_PREFIXES):
        return P(mesh_axis, *([None] * (ndim - 1)))
    return P()


def shard_kernel_bank(params: dict, mesh: Mesh) -> dict:
    """Place every bank-shaped parameter row-sharded over ``model``; everything
    else replicated. Bank row counts must divide the model-axis size."""
    out = {}
    for k, v in params.items():
        spec = _param_spec(k, v.ndim)
        if spec != P() and v.shape[0] % mesh.shape["model"]:
            spec = P()  # indivisible bank: replicate rather than fail
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def bank_sharded_apply(transform, mesh: Mesh, **static_kwargs):
    """Callable running ``transform`` with its kernel bank row-sharded over
    ``model`` and the batch over ``data``. Output: batch-sharded over ``data``
    and frequency-sharded over ``model``."""
    param_shardings = {
        k: NamedSharding(mesh, _param_spec(k, v.ndim))
        if not (_param_spec(k, v.ndim) != P() and v.shape[0] % mesh.shape["model"])
        else replicate(mesh)
        for k, v in transform.forward_params.items()
    }
    fwd = jax.jit(
        functools.partial(transform._forward, **static_kwargs),
        in_shardings=(param_shardings, NamedSharding(mesh, P("data", None))),
    )

    def run(x, params=None):
        merged = dict(transform.forward_params)
        if params:
            merged.update(params)
        merged = {k: jax.device_put(v, param_shardings[k]) for k, v in merged.items()}
        return fwd(merged, shard_batch(x, mesh))

    return run


def contraction_sharded_cqt1992(transform, mesh: Mesh, axis: str = "model",
                                output_format: str | None = None,
                                normalization_type: str = "librosa"):
    """Tensor-parallel CQT1992 with the **contraction** axis sharded: each
    chip holds a slice of the Fourier bins and the matching kernel columns,
    computes its partial complex product, and the partials are reduced with
    ``psum`` over the ``axis`` ring (the BASELINE "psum reduction of
    partial-band outputs" strategy — complements the reduction-free row
    sharding of :func:`bank_sharded_apply`).

    Requires the two-stage (trainable-style) CQT1992 parameterization:
    ``wcos/wsin`` row-sharded over Fourier bins, ``cqt_kernels_*``
    column-sharded over the same bins. Supports the transform's full output
    surface: ``output_format`` in Magnitude/Complex/Phase and every
    ``normalization_type`` (librosa/convolutional/wrap), including the
    reference's Phase-on-raw-pair quirk (cqt.py:249-251).
    """
    import jax.numpy as jnp
    from jax import lax, shard_map
    from jax.sharding import PartitionSpec as P

    from ..core.frame import pad_signal
    from ..config import dot_precision
    from ..core.apply import phase_unit_stack
    from ..features.cqt import _check_norm_type, _cqt_output

    _check_norm_type(normalization_type)

    n = mesh.shape[axis]
    p = dict(transform.params)
    f_in = p["wcos"].shape[0]
    f_pad = -f_in % n
    if f_pad:
        # zero Fourier-bin rows / kernel columns contribute nothing — pad the
        # contraction axis to a shardable size, exactly
        p["wcos"] = jnp.pad(p["wcos"], ((0, f_pad), (0, 0)))
        p["wsin"] = jnp.pad(p["wsin"], ((0, f_pad), (0, 0)))
        p["cqt_kernels_real"] = jnp.pad(p["cqt_kernels_real"], ((0, 0), (0, f_pad)))
        p["cqt_kernels_imag"] = jnp.pad(p["cqt_kernels_imag"], ((0, 0), (0, f_pad)))
    hop = transform.hop_length
    width = transform.kernel_width
    pad_amount = width // 2 if transform.center else 0
    pad_mode = transform.pad_mode
    output_format = output_format or transform.output_format

    def local(x, wcos, wsin, kr, ki):
        # x replicated; wcos/wsin: this shard's Fourier-bin rows;
        # kr/ki: the matching kernel columns
        prec = dot_precision()
        if pad_amount:
            x = pad_signal(x, pad_amount, pad_mode)
        from ..ops.dispatch import framed_basis_pair

        fr, fi = framed_basis_pair(x, wcos, wsin, hop)
        part_re = (jnp.einsum("gf,bft->bgt", kr, fr, precision=prec,
                              preferred_element_type=jnp.float32)
                   - jnp.einsum("gf,bft->bgt", ki, fi, precision=prec,
                                preferred_element_type=jnp.float32))
        part_im = (jnp.einsum("gf,bft->bgt", kr, fi, precision=prec,
                              preferred_element_type=jnp.float32)
                   + jnp.einsum("gf,bft->bgt", ki, fr, precision=prec,
                                preferred_element_type=jnp.float32))
        # reduce partial products over ICI
        return lax.psum(part_re, axis), lax.psum(part_im, axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None),
                  P(None, axis), P(None, axis)),
        out_specs=(P(), P()),
    )

    def head(cqt_real, cqt_imag, lengths):
        # identical to CQT1992._forward's output head (features/cqt.py)
        real_n, imag_n = cqt_real, -cqt_imag
        if normalization_type == "librosa":
            scale = jnp.sqrt(lengths)[None, :, None] / width
            real_n, imag_n = real_n * scale, imag_n * scale
        elif normalization_type == "wrap":
            real_n = real_n * (2 / width)
            imag_n = imag_n * (2 / width)
        if output_format == "Phase":
            return phase_unit_stack(cqt_real, cqt_imag)
        return _cqt_output(real_n, imag_n, output_format, trainable=False)

    jitted = jax.jit(
        lambda x, wc, ws, kr, ki, lengths: head(*fn(x, wc, ws, kr, ki),
                                                lengths)
    )

    def run(x):
        return jitted(
            jnp.asarray(x), p["wcos"], p["wsin"],
            p["cqt_kernels_real"], p["cqt_kernels_imag"], p["lenghts"],
        )

    return run


def bank_sharded_inverse(transform, mesh: Mesh, axis: str = "model",
                         data_axis: str = "data",
                         normalization_type: str = "librosa",
                         band_eta: float = 1e-3, length: int | None = None):
    """Tensor-parallel inverse CQT: the canonical-dual synthesis bank's
    rows (bins) sharded over ``axis``, the batch over ``data_axis``. Each
    chip OLA-synthesizes its bins' contribution to the waveform and the
    partial signals are ``psum``-reduced over ICI — synthesis is the
    transpose of the analysis contraction, so where the forward's row
    sharding is reduction-free, the inverse's needs exactly one psum of
    a (B_local, L) signal per call.

    Works for every transform with an inverse: CQT1992v2 (flat dual bank)
    and the pyramid families (collapsed single-rate dual bank,
    ``_PyramidCQT._pyramid_dual_kernels``)."""
    import jax.numpy as jnp
    from jax import lax, shard_map

    from ..features.cqt import _check_norm_type

    _check_norm_type(normalization_type)
    if hasattr(transform, "_dual_kernels"):  # CQT1992v2 / CQT alias
        kc, ks = transform._dual_kernels(normalization_type, band_eta)
        hop = transform.hop_length
        start = transform.kernel_width // 2 if transform.center else 0

        def natural(t):
            full = transform.kernel_width + hop * (t - 1)
            return full - 2 * start
    else:  # pyramid families
        kc, ks, start, hop = transform._pyramid_dual_kernels(
            normalization_type, band_eta)

        def natural(t):
            return hop * (t - 1)

    n = mesh.shape[axis]
    f_pad = -kc.shape[0] % n
    if f_pad:
        # zero dual rows synthesize nothing — pad the bin axis to a
        # shardable size, exactly
        kc = jnp.pad(kc, ((0, f_pad), (0, 0)))
        ks = jnp.pad(ks, ((0, f_pad), (0, 0)))

    def local(Xr, Xi, kc_l, ks_l):
        from ..ops.dispatch import synthesis_ola

        sig = synthesis_ola(Xr, Xi, kc_l, ks_l, hop)
        return lax.psum(sig, axis)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, axis, None), P(data_axis, axis, None),
                  P(axis, None), P(axis, None)),
        out_specs=P(data_axis),
    )

    def graph(Xr, Xi):
        t = Xr.shape[2]
        sig = fn(Xr, Xi, kc, ks)
        want = natural(t) if length is None else length
        out = sig[:, start: start + want]
        if out.shape[-1] < want:
            out = jnp.pad(out, ((0, 0), (0, want - out.shape[-1])))
        return out

    jitted = jax.jit(graph)

    def run(X):
        import jax.numpy as jnp

        X = jnp.asarray(X)
        if f_pad:
            X = jnp.pad(X, ((0, 0), (0, f_pad), (0, 0), (0, 0)))
        return jitted(X[..., 0], X[..., 1])

    return run
