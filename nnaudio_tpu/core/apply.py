"""Basis application and spectrogram output heads (device hot path).

Every transform in this framework is `frames @ basisᵀ` on the MXU — the
TPU-native replacement for the reference's strided conv1d dispatch
(``stft.py:290-293``, ``cqt.py:749-750``). Output formats preserve the
reference's API-visible conventions: negated-imaginary ``Complex`` stacks
(``stft.py:309-311``), scalar ``atan2`` Phase for STFT (``stft.py:313-316``)
versus (cos, sin) Phase stacks for CQTs (``cqt.py:777-780``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import dot_precision


def apply_basis(frames: jax.Array, basis: jax.Array) -> jax.Array:
    """(B, T, N) frames × (F, N) basis -> (B, F, T) via one MXU matmul."""
    return jnp.einsum(
        "btn,fn->bft",
        frames,
        basis,
        precision=dot_precision(),
        preferred_element_type=jnp.float32,
    )


def project(basis: jax.Array, spec: jax.Array) -> jax.Array:
    """(F_out, F_in) × (B, F_in, T) -> (B, F_out, T) filterbank projection
    (replaces torch.matmul at mel.py:188 / gammatone.py:188)."""
    return jnp.einsum(
        "gf,bft->bgt",
        basis,
        spec,
        precision=dot_precision(),
        preferred_element_type=jnp.float32,
    )


def magnitude(real: jax.Array, imag: jax.Array, trainable: bool = False) -> jax.Array:
    """sqrt(re² + im²); +1e-8 under the root when trainable to keep the
    gradient finite at 0 (stft.py:299-306)."""
    power = real * real + imag * imag
    if trainable:
        return jnp.sqrt(power + 1e-8)
    return jnp.sqrt(power)


def complex_stack(real: jax.Array, imag: jax.Array) -> jax.Array:
    """Stack (real, imag) on a new last axis — reference complex layout."""
    return jnp.stack((real, imag), axis=-1)


def phase_atan(real: jax.Array, imag: jax.Array) -> jax.Array:
    """Scalar phase via atan2; ``+0.0`` scrubs -0.0 exactly like the
    reference (stft.py:313-316)."""
    return jnp.arctan2(imag + 0.0, real)


def phase_unit_stack(real: jax.Array, imag: jax.Array) -> jax.Array:
    """(cos θ, sin θ) stack used by the CQT family (cqt.py:777-780)."""
    theta = jnp.arctan2(imag, real)
    return jnp.stack((jnp.cos(theta), jnp.sin(theta)), axis=-1)


def complex_bank_mul(
    kernel_real: jax.Array,
    kernel_imag: jax.Array,
    spec_real: jax.Array,
    spec_imag: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Complex matmul (a+bi)(c+di) (replaces ``complex_mul`` at
    utils.py:175-203), packed as ONE stacked real MXU product instead of four
    skinny ones: ``[[kr, -ki], [ki, kr]] @ [fr; fi]`` — a single
    (2F_out, 2F_in) x (B, 2F_in, T) contraction keeps the MXU busy and reads
    the Fourier maps once."""
    bank = jnp.concatenate(
        (
            jnp.concatenate((kernel_real, -kernel_imag), axis=1),
            jnp.concatenate((kernel_imag, kernel_real), axis=1),
        ),
        axis=0,
    )
    spec = jnp.concatenate((spec_real, spec_imag), axis=1)
    out = project(bank, spec)
    f_out = kernel_real.shape[0]
    return out[:, :f_out], out[:, f_out:]
