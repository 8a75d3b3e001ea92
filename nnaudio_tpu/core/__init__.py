"""Jit-clean functional runtime: framing, basis matmuls, overlap-add."""
from .frame import (
    broadcast_dim,
    frame_signal,
    frames_to_signal,
    num_frames,
    pad_signal,
)
from .apply import (
    apply_basis,
    complex_bank_mul,
    complex_stack,
    magnitude,
    phase_atan,
    phase_unit_stack,
    project,
)
from .overlap import (
    extend_fbins,
    normalize_by_window_envelope,
    overlap_add,
    window_sumsquare,
)
from .resample import downsample_by_2, downsample_by_n

__all__ = [
    "broadcast_dim",
    "frame_signal",
    "frames_to_signal",
    "num_frames",
    "pad_signal",
    "apply_basis",
    "complex_bank_mul",
    "complex_stack",
    "magnitude",
    "phase_atan",
    "phase_unit_stack",
    "project",
    "extend_fbins",
    "normalize_by_window_envelope",
    "overlap_add",
    "window_sumsquare",
    "downsample_by_2",
    "downsample_by_n",
]
