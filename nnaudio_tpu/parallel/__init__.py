"""Multi-chip scale-out via ``jax.sharding`` (SURVEY.md §2.3).

The reference's only parallelism is single-process ``torch.nn.DataParallel``
compatibility (test_stft.py:116-141). The TPU-native equivalents here are
strictly stronger:

- :func:`make_mesh` / :func:`data_parallel` — batch-axis (DP) sharding over a
  ``("data", "model")`` mesh; XLA inserts all communication.
- :func:`shard_kernel_bank` — tensor-parallel frequency-bank sharding: basis
  rows split across the ``model`` axis; disjoint rows need no reduction, the
  output spectrogram comes out frequency-sharded.
- :mod:`timeshard` — sequence-parallel long-audio STFT/iSTFT: the time axis is
  sharded across chips with ``(n_fft - hop)``-sample halo exchange over ICI
  (``lax.ppermute``); the inverse does the mirrored halo reduction.
"""
from .mesh import make_mesh, local_batch_sharding, replicate
from .data import data_parallel, shard_batch
from . import bank
from .bank import (
    bank_sharded_apply,
    contraction_sharded_cqt1992,
    shard_kernel_bank,
)
from .timeshard import time_sharded_stft, time_sharded_istft
from .input import (
    distributed_initialize,
    global_batch_from_host_local,
    iter_host_batches,
)

__all__ = [
    "make_mesh",
    "local_batch_sharding",
    "replicate",
    "data_parallel",
    "shard_batch",
    "shard_kernel_bank",
    "bank_sharded_apply",
    "contraction_sharded_cqt1992",
    "time_sharded_stft",
    "time_sharded_istft",
    "distributed_initialize",
    "global_batch_from_host_local",
    "iter_host_batches",
]
