"""Pallas TPU kernels + backend dispatch for the compute hot path."""
from .dispatch import framed_basis_pair

__all__ = ["framed_basis_pair"]
