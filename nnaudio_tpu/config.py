"""Global numerics / execution configuration.

The reference is float32 end-to-end; TPU matmuls default to bf16 passes. We
default every parity-critical contraction to full fp32 MXU precision
(``HIGHEST``) and expose a fast mode (``DEFAULT`` ≈ bf16 multiplies with fp32
accumulation) for throughput-critical deployments (SURVEY.md §7 "Numerics").
"""
from __future__ import annotations

import contextlib
from dataclasses import dataclass

import jax


@dataclass
class _Config:
    # jax.lax.Precision for basis matmuls: "highest" (fp32 parity, default)
    # or "default" (bf16 fast mode).
    matmul_precision: str = "highest"
    # Master switch for the fused Pallas kernels on TPU (the frame+matmul+
    # magnitude/power/filterbank epilogue kernels and the synthesis+OLA
    # kernel; see ops/dispatch.py).
    use_pallas: bool = True
    # Fused analysis kernels (magnitude/power/filterbank epilogues).
    # None = auto (round-5 device-true policy, tools/profile_r5_dispatch.py
    # — the round-2/3 "1.25x at HIGHEST" wins were floor-damped AND predate
    # the round-5 frame_signal fix that sped the XLA chain up): fused in
    # fast (bf16) mode at 128-aligned hops (1.16-1.5x XLA); at misaligned
    # hops (q > 1) and in fp32-HIGHEST mode XLA wins (parity at the aligned
    # headline, 1.4-5.9x elsewhere) — EXCEPT small divisor hops
    # (hop < 128 dividing n_fft), where XLA's skinny-K chunked einsum
    # collapses and the kernel wins 1.5-6x at both precisions.
    # True/False force it.
    use_pallas_analysis: bool | None = None
    # Fused synthesis+overlap-add kernel (iSTFT/Griffin-Lim). None = auto
    # (round-3 policy): always on in fast (bf16) mode (73.5k vs 66.2k XLA
    # at the headline config); in the fp32 modes on only where XLA's
    # scatter-OLA collapses — misaligned hops (speech 160/320: 1.8-3.1x)
    # or >9-chunk overlaps — while the aligned headline keeps XLA (46.0k
    # vs 34.2k). True/False force it.
    use_pallas_synthesis: bool | None = None
    # Fused CQT2010/CQT2010v2/VQT pyramid: all octaves' projections in one
    # batched einsum instead of 7 ill-shaped per-octave dispatches
    # (ops/pyramid.py). None = auto: OFF — the round-4 on-chip A/B
    # (tools/profile_r3b.py, calm chip): the fused contraction measured
    # 0.84-0.86x the per-octave loop at HIGHEST (37.7-38.3k vs
    # 44.3-44.8k audio-s/s) and parity (1.01-1.02x) in fast mode, for
    # both CQT2010v2 and VQT. Exact (4e-7 vs the loop, gradient-tested);
    # True forces it on.
    use_fused_pyramid: bool | None = None
    # MXU-staged real FFT for CFP's interior transforms (ops/mxu_fft.py).
    # None = auto: OFF — the round-4 on-chip A/B (tools/profile_r3b.py)
    # measured it at 0.24-0.29x the XLA FFT inside the real CFP chain
    # (XLA fuses the rfft with the elementwise layers; the staged matmul
    # path can't). True forces it on for experiments.
    use_mxu_fft: bool | None = None
    # Parallel pyramid decimation chain (CQT2010/CQT2010v2/VQT): every
    # octave level computed directly from the top-rate signal with one
    # strided banded matmul over a composed cascade filter
    # (core/resample.compose_cascade) instead of the serial per-octave
    # lowpass+decimate chain. Exact up to fp32 reassociation. None =
    # auto: OFF — the round-4 on-chip A/B (tools/profile_r4_chain.py)
    # measured it at 0.19-0.25x the serial chain (~34.5 ms vs ~7.3 ms/
    # batch) across CQT2010v2/VQT x both precisions x fused-pyramid
    # on/off: the composed filters' dense-FLOP blowup (level k pays a
    # 255*2^k-tap band at the FULL rate; Σ_k ≈ 64x the serial chain's
    # taps) dominates any dispatch-shape win. True forces it on.
    use_parallel_chain: bool | None = None


_config = _Config()


def get_config() -> _Config:
    return _config


def set_matmul_precision(mode: str) -> None:
    if mode not in ("highest", "default", "tensorfloat32"):
        raise ValueError(f"unknown matmul precision {mode!r}")
    _config.matmul_precision = mode


def set_use_pallas(flag: bool) -> None:
    _config.use_pallas = bool(flag)


def set_use_pallas_analysis(flag: bool | None) -> None:
    _config.use_pallas_analysis = flag if flag is None else bool(flag)


def set_use_pallas_synthesis(flag: bool | None) -> None:
    _config.use_pallas_synthesis = flag if flag is None else bool(flag)


def set_use_fused_pyramid(flag: bool | None) -> None:
    _config.use_fused_pyramid = flag if flag is None else bool(flag)


def set_use_mxu_fft(flag: bool | None) -> None:
    _config.use_mxu_fft = flag if flag is None else bool(flag)


def set_use_parallel_chain(flag: bool | None) -> None:
    _config.use_parallel_chain = flag if flag is None else bool(flag)


def parallel_chain_enabled() -> bool:
    flag = _config.use_parallel_chain
    if flag is None:
        # round-4 on-chip A/B (tools/profile_r4_chain.py): parallel chain
        # measured 0.19-0.25x the serial chain across all 8 configs.
        return False
    return flag


@contextlib.contextmanager
def fast_mode():
    """Context: bf16-multiply matmuls for max MXU throughput."""
    prev = _config.matmul_precision
    _config.matmul_precision = "default"
    try:
        yield
    finally:
        _config.matmul_precision = prev


def dot_precision() -> jax.lax.Precision:
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "default": jax.lax.Precision.DEFAULT,
        "tensorfloat32": jax.lax.Precision.HIGH,
    }[_config.matmul_precision]


#: every config field that can change compiled-graph behavior
_SALT_FIELDS = ("matmul_precision", "use_pallas", "use_pallas_analysis",
                "use_pallas_synthesis", "use_fused_pyramid", "use_mxu_fft",
                "use_parallel_chain")


def cache_salt(fields: tuple = _SALT_FIELDS) -> tuple:
    """Config state that changes compiled-graph behavior — included in every
    transform's jit-cache key so toggling ``fast_mode()`` / the pallas
    switches takes effect on transforms that have already been called
    (matmul precision and dispatch choices are captured at trace time).

    ``fields`` narrows the salt to the switches a given transform's graph
    actually reads (``SpectralTransform._salt_fields``): flipping a switch
    no transform path depends on (e.g. ``use_mxu_fft``, read only by CFP)
    must not force a retrace — and a possible 60-90 s Mosaic recompile —
    of every other already-used transform."""
    return tuple(getattr(_config, f) for f in fields)


def on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing should not fail
        return False
