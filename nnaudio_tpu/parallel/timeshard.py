"""Sequence-parallel long-audio STFT/iSTFT: time axis sharded across chips.

New capability beyond the reference (SURVEY.md §2.3: "longest-sequence
handling is the CQT2010 downsampling pyramid, which bounds kernel length, not
signal length"). A single long utterance is sharded along time; each chip
frames its local chunk after receiving an ``(n_fft - hop)``-sample halo from
its right neighbour over ICI (``lax.ppermute``, a 1-D ring). The inverse
overlap-add sends its tail halo **to** the right neighbour and adds — the
exact adjoint, so ``istft(stft(x))`` round-trips across shards.

Conventions: ``center=False``; the local signal length must be a multiple of
``hop`` and at least ``n_fft - hop``. With global length ``L = N * L_local``
the output has ``L // hop`` frames — identical to an unsharded
``center=False`` STFT of ``x`` zero-padded by ``n_fft - hop`` at the end
(the equivalence the tests enforce).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import dot_precision
from ..core.frame import frame_signal, frames_to_signal


def _stft_local(x_local, wcos, wsin, hop, axis):
    """Per-shard body: halo exchange + frame + basis matmul."""
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    n_fft = wcos.shape[-1]
    halo = n_fft - hop

    if halo > 0 and n > 1:
        # receive the first `halo` samples of the right neighbour:
        # ppermute sends shard i's head to shard i-1
        head = x_local[:, :halo]
        recv = lax.ppermute(head, axis, perm=[(i, (i - 1) % n) for i in range(n)])
        recv = jnp.where(idx == n - 1, jnp.zeros_like(recv), recv)
        x_ext = jnp.concatenate((x_local, recv), axis=-1)
    elif halo > 0:
        x_ext = jnp.pad(x_local, ((0, 0), (0, halo)))
    else:
        x_ext = x_local

    frames = frame_signal(x_ext, n_fft, hop)  # (B, T_local, n_fft)
    prec = dot_precision()
    real = jnp.einsum("btn,fn->bft", frames, wcos, precision=prec,
                      preferred_element_type=jnp.float32)
    imag = jnp.einsum("btn,fn->bft", frames, wsin, precision=prec,
                      preferred_element_type=jnp.float32)
    return real, imag


@functools.lru_cache(maxsize=64)
def _stft_sharded_fn(mesh: Mesh, axis: str, hop: int):
    """One stable jitted callable per (mesh, axis, hop) — building a fresh
    shard_map + jit wrapper inside every call would miss jax.jit's
    executable cache (it keys on function identity) and recompile each
    invocation."""
    fn = shard_map(
        functools.partial(_stft_local, hop=hop, axis=axis),
        mesh=mesh,
        in_specs=(P(None, axis), P(), P()),
        out_specs=(P(None, None, axis), P(None, None, axis)),
    )
    return jax.jit(fn)


def time_sharded_stft(x, wcos, wsin, hop: int, mesh: Mesh, axis: str = "data"):
    """(B, L) time-sharded over ``axis`` -> two (B, F, L//hop) maps
    (cos / un-negated sin projections), time-sharded over the same axis."""
    n = mesh.shape[axis]
    n_fft = wcos.shape[-1]
    if x.shape[-1] % (n * hop):
        raise ValueError(
            f"global length {x.shape[-1]} must be divisible by n_shards*hop "
            f"= {n * hop}"
        )
    if x.shape[-1] // n < n_fft - hop:
        raise ValueError("local chunk shorter than the halo (n_fft - hop)")

    fn = _stft_sharded_fn(mesh, axis, hop)
    return fn(jnp.asarray(x), jnp.asarray(wcos), jnp.asarray(wsin))


def _istft_local(frames_local, window, hop, axis):
    """Per-shard adjoint: local overlap-add + tail-halo reduction to the right
    neighbour. ``frames_local``: (B, T_local, n_fft) pre-windowed IDFT frames."""
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    n_fft = frames_local.shape[-1]
    halo = n_fft - hop
    t_local = frames_local.shape[-2]
    l_local = t_local * hop

    full = frames_to_signal(frames_local, hop, l_local + halo)
    body, tail = full[:, :l_local], full[:, l_local:]
    if halo > 0 and n > 1:
        # my tail overlaps the right neighbour's head: ship it right and add
        recv = lax.ppermute(tail, axis, perm=[(i, (i + 1) % n) for i in range(n)])
        recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
        body = body.at[:, :halo].add(recv)
    return body


def _istft_shard_body(spec_r, spec_i, kc, ks, w, *, hop, axis):
    prec = dot_precision()
    n_fft = kc.shape[0]
    frames = jnp.einsum("jf,bft->btj", kc, spec_r, precision=prec,
                        preferred_element_type=jnp.float32)
    frames = frames - jnp.einsum("jf,bft->btj", ks, spec_i, precision=prec,
                                 preferred_element_type=jnp.float32)
    frames = frames * w[None, None, :] / n_fft
    sig = _istft_local(frames, w, hop, axis)
    # window envelope: same overlap-add + halo reduction applied to w^2
    t_local = spec_r.shape[-1]
    wsq = jnp.broadcast_to(w[None, None, :] ** 2, (1, t_local, n_fft))
    env = _istft_local(wsq, w, hop, axis)
    return jnp.where(env > 1e-10, sig / jnp.where(env > 1e-10, env, 1.0), sig)


@functools.lru_cache(maxsize=64)
def _istft_sharded_fn(mesh: Mesh, axis: str, hop: int):
    """Stable jitted callable per (mesh, axis, hop) — see _stft_sharded_fn."""
    fn = shard_map(
        functools.partial(_istft_shard_body, hop=hop, axis=axis),
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None, None, axis), P(), P(), P()),
        out_specs=P(None, axis),
    )
    return jax.jit(fn)


def time_sharded_istft(
    spec_real, spec_imag, kernel_cos, kernel_sin, window, hop: int,
    mesh: Mesh, axis: str = "data",
):
    """Inverse of :func:`time_sharded_stft` for full-bin (n_fft-row) kernels:
    (B, n_fft, T) time-sharded spectra -> (B, T*hop) time-sharded waveform,
    normalized by the window sum-square envelope."""
    fn = _istft_sharded_fn(mesh, axis, hop)
    return fn(
        jnp.asarray(spec_real), jnp.asarray(spec_imag),
        jnp.asarray(kernel_cos), jnp.asarray(kernel_sin), jnp.asarray(window),
    )
