"""Streaming (chunked) feature extraction for online/serving pipelines.

Beyond-reference capability: the reference (and librosa) are offline-only —
a serving system that receives audio in chunks must either re-run the
transform over a growing buffer (O(L^2) total work) or hand-roll the
overlap bookkeeping. This module does the bookkeeping once, exactly:

    stream = StreamingSTFT(n_fft=2048, hop_length=512)
    state = stream.init_state(batch)
    for chunk in chunks:                       # each len % hop == 0
        state, frames = stream.step(state, chunk)

``concat(frames)`` equals the offline ``center=False`` transform of
``concat(chunks)`` — the same frames hit the same kernels (the state
carries exactly the samples every frame boundary straddles, so no
recompute and no approximation at chunk seams; agreement is to the last
ulp, as the per-chunk matmul tiling may associate reductions differently
than one whole-signal matmul). All shapes are static per chunk length:
under ``jit`` each distinct (chunk size, progress) pair compiles once. In
steady state (fixed chunk size, primed) the compiled body is a pure
array function ``(params, buffer, chunk) -> (buffer', frames)`` — that
function (not the Python ``step`` wrapper, whose ``primed`` bookkeeping
is static) can ride ``lax.scan`` over pre-split chunks or ``shard_map``
over a batch mesh axis.

TPU mapping: each ``step`` is the same framed basis matmul as the offline
transform (MXU). By default a serving-sized chunk sits below the fused
kernels' workload gate (``ops.framed_matmul._MIN_FUSED_FRAMES`` exists to
keep one-shot toy workloads off the ~60-90 s Mosaic compile path), so steps
run the fast-compiling XLA path. A steady-state stream re-runs ONE compiled
step thousands of times, amortizing that compile — pass ``fuse=True`` to
trace the step with the gate overridden and run the fused Pallas kernels
per chunk (or ``fuse=False`` to pin the XLA path; default ``None`` leaves
the workload gate in charge).

Design notes / contract:
- ``center=False`` convention (the only one with a causal streaming
  equivalent; a centered stream would need ``n_fft//2`` samples of
  lookahead). Offline equivalence target: ``STFT(..., center=False)``.
- chunk lengths must be multiples of ``hop_length`` (frame boundaries
  then land on chunk boundaries; enforced). Chunks may vary in length
  between calls.
- the first ``n_fft - hop`` samples only *prime* the state: frame 0 spans
  ``x[0:n_fft]``, exactly like offline. Until ``n_fft`` samples have
  arrived, ``step`` emits 0 frames (static per chunk-size/progress, so
  this only matters for chunks shorter than ``n_fft``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .features.stft import STFT
from .ops import framed_matmul
from .ops.dispatch import framed_basis_pair, framed_magnitude


# distinct (batch, chunk_len, progress) jit-cache keys before warning: a
# caller feeding network-paced variable-length chunks pays a fresh
# trace/compile per distinct chunk length (60-90 s each when fused) and the
# cache grows without bound — pad chunks to one fixed length.
_CACHE_WARN_KEYS = 16


def _warn_cache_growth(obj) -> None:
    if obj._cache_warned or len(obj._jit_cache) < _CACHE_WARN_KEYS:
        return
    obj._cache_warned = True
    import warnings

    warnings.warn(
        f"{type(obj).__name__}.step has compiled {len(obj._jit_cache)} "
        "distinct step shapes (batch x chunk length for analysis streams, "
        "batch x frame count for StreamingiSTFT); each costs a fresh "
        "trace/compile and is cached forever. Pad variable-length chunks "
        "to one fixed size."
    )


class StreamState(NamedTuple):
    """Carry between chunks: the not-yet-consumed tail of the stream
    (right-aligned, zeros until primed) and how many of its samples are
    real (a static Python int — part of the jit cache key, NOT traced).

    Capacity is ``ceil((n_fft - hop)/hop) * hop``: with hop-multiple
    chunks the un-consumed leftover is always ``≡ 0 (mod hop)`` in
    ``[n_fft - hop, n_fft - hop + hop)``, which exceeds ``n_fft - hop``
    itself whenever ``n_fft % hop != 0`` (e.g. 512/160 carries 480)."""

    buffer: jax.Array  # (B, buf_cap)
    primed: int        # count of valid samples in buffer, 0..buf_cap


def _make_carry_step(width: int, hop: int, buf_cap: int, c: int, primed: int,
                     apply_sig, empty_out):
    """Generic streaming step for any FRAME-LOCAL transform (output column
    ``t`` depends only on ``sig[t*hop : t*hop + width]``). Returns
    ``(fn, new_primed)`` where fn maps (params, buffer, chunk) ->
    (new_buffer, frames). All sizes below are Python ints — the traced
    graph is static.

    ``apply_sig(params, sig)`` computes the transform over an exact-length
    signal (``(n_frames-1)*hop + width`` samples); ``empty_out(params, b)``
    builds the zero-frame output while priming."""
    valid = primed + c          # samples available this step
    n_frames = max(0, (valid - width) // hop + 1)
    # samples consumed by emitted frames; the remainder carries over. With
    # hop-multiple chunks the leftover is in [width-hop, width-hop+hop) ∩
    # hopZ after any emission, and == valid (< width) while priming — both
    # bounded by buf_cap.
    consumed = n_frames * hop
    new_primed = valid - consumed
    assert 0 <= new_primed <= buf_cap, (new_primed, buf_cap)

    def step(params, buffer, chunk):
        ext = jnp.concatenate((buffer[:, buffer.shape[1] - primed:] if primed
                               else chunk[:, :0], chunk), axis=-1)
        tail = ext[:, ext.shape[1] - new_primed:] if new_primed else ext[:, :0]
        pad = buf_cap - new_primed
        new_buffer = (jnp.pad(tail, ((0, 0), (pad, 0))) if pad else tail)
        if n_frames == 0:
            return new_buffer, empty_out(params, chunk.shape[0])
        sig = ext[:, : (n_frames - 1) * hop + width]
        return new_buffer, apply_sig(params, sig)

    return step, new_primed


class _StreamingFramed:
    """Shared chunked-analysis machinery for FRAME-LOCAL transforms
    (output column ``t`` depends only on ``sig[t*hop : t*hop + width]``).
    Subclasses call :meth:`_init_stream` and implement
    ``_apply_sig(params, sig)`` / ``_empty_out(params, batch)``; the
    jit-cache keys on (batch, chunk_len, progress, config salt) — one
    compile per distinct combination, via one shared wrapper so the
    caching contract (incl. keeping ``primed`` a Python int out of the
    jitted pytree) lives in exactly one place."""

    #: config switches the _apply_sig graph reads
    _salt_fields = ("matmul_precision", "use_pallas", "use_pallas_analysis")

    def _init_stream(self, width: int, hop: int, params: dict,
                     fuse: bool | None = None) -> None:
        if hop > width:
            raise ValueError("hop_length > frame width has gaps; "
                             "cannot stream")
        self.width = width
        self.hop = hop
        self.fuse = fuse
        self._params = dict(params)
        self._jit_cache: dict = {}
        self._cache_warned = False

    @property
    def overlap(self) -> int:
        return self.width - self.hop

    @property
    def buf_cap(self) -> int:
        """Carry capacity (see :class:`StreamState`)."""
        return -(-self.overlap // self.hop) * self.hop

    def init_state(self, batch: int) -> StreamState:
        return StreamState(
            buffer=jnp.zeros((batch, self.buf_cap), jnp.float32), primed=0
        )

    # ------------------------------------------------------------- one step
    def step(self, state: StreamState, chunk) -> tuple[StreamState, jax.Array]:
        """Consume one ``(B, C)`` chunk (``C % hop == 0``); return
        ``(new_state, frames)`` with the time axis sized ``C//hop`` once
        primed (first frames appear when ``width`` samples have arrived).

        Feed a FIXED chunk length in steady state: every distinct
        ``(batch, len(chunk), progress)`` combination traces and compiles a
        fresh step (60-90 s each on TPU when ``fuse=True``) and the compiled
        functions are cached per combination without bound — pad
        network-paced variable-length chunks to one size."""
        chunk = jnp.asarray(chunk)
        if chunk.ndim == 1:
            chunk = chunk[None]
        b, c = chunk.shape
        if c % self.hop:
            raise ValueError(
                f"chunk length {c} must be a multiple of hop={self.hop}"
            )
        from .config import cache_salt

        key = (b, c, state.primed, self.fuse, cache_salt(self._salt_fields))
        entry = self._jit_cache.get(key)
        if entry is None:
            _warn_cache_growth(self)
            fn, new_primed = _make_carry_step(
                self.width, self.hop, self.buf_cap, c, state.primed,
                self._apply_sig, self._empty_out)
            entry = (jax.jit(fn), new_primed)
            self._jit_cache[key] = entry
        fn, new_primed = entry
        # `primed` stays a Python int: the jitted body returns only arrays
        # (a jit-returned NamedTuple would trace the int into an ArrayImpl
        # and poison the next step's cache key). Tracing happens inside the
        # first fn() call, so the fuse override wraps the call, not the jit.
        with framed_matmul.force_fuse(self.fuse):
            new_buffer, frames = fn(self._params, state.buffer, chunk)
        return StreamState(new_buffer, new_primed), frames

    # ------------------------------------------------- whole-signal helper
    def stream(self, x, chunk_len: int):
        """Generator over a pre-recorded ``(B, L)`` signal in
        ``chunk_len``-sized chunks (for testing / file processing). A
        trailing remainder is processed too, floored to a hop multiple —
        only the final sub-hop residue (which completes no frame) is
        dropped."""
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[None]
        state = self.init_state(x.shape[0])
        total = x.shape[-1]
        pos = 0
        while pos < total:
            c = min(chunk_len, total - pos)
            c = (c // self.hop) * self.hop
            if c == 0:
                break
            state, frames = self.step(state, x[:, pos : pos + c])
            pos += c
            if frames.shape[2]:  # time axis (shape[-1] is ri for Complex)
                yield frames


class StreamingSTFT(_StreamingFramed):
    """Chunked STFT with exact offline equivalence (``center=False``).

    Parameters mirror :class:`~nnaudio_tpu.features.stft.STFT` (the kernel
    construction is shared); ``output_format`` in {'Magnitude', 'Complex'}.

    Examples
    --------
    >>> stream = StreamingSTFT(n_fft=512, hop_length=128)
    >>> state = stream.init_state(batch=1)
    >>> state, f1 = stream.step(state, chunk1)   # (1, F, T1)
    >>> state, f2 = stream.step(state, chunk2)   # (1, F, T2)
    # jnp.concatenate([f1, f2], -1) == STFT(center=False)(chunk1+chunk2)
    """

    def __init__(
        self,
        n_fft: int = 2048,
        hop_length: int | None = None,
        win_length: int | None = None,
        freq_bins: int | None = None,
        window: str = "hann",
        freq_scale: str = "no",
        sr: float = 22050,
        fmin: float = 50,
        fmax: float = 6000,
        output_format: str = "Magnitude",
        verbose: bool = False,
        fuse: bool | None = None,
    ):
        if output_format not in ("Magnitude", "Complex"):
            raise ValueError(
                "streaming supports output_format 'Magnitude' or 'Complex'"
            )
        self.n_fft = n_fft
        hop = n_fft // 4 if hop_length is None else hop_length
        self.output_format = output_format
        self._stft = STFT(
            n_fft=n_fft, hop_length=hop, win_length=win_length,
            freq_bins=freq_bins, window=window, freq_scale=freq_scale,
            sr=sr, fmin=fmin, fmax=fmax, center=False,
            output_format=output_format, verbose=verbose,
        )
        self._init_stream(n_fft, hop, self._stft._params, fuse=fuse)

    def _apply_sig(self, params, sig):
        if self.output_format == "Magnitude":
            return framed_magnitude(sig, params["wcos"], params["wsin"],
                                    self.hop, eps=0.0)
        re, im_raw = framed_basis_pair(sig, params["wcos"], params["wsin"],
                                       self.hop)
        return jnp.stack((re, -im_raw), axis=-1)

    def _empty_out(self, params, b):
        f = params["wcos"].shape[0]
        return (jnp.zeros((b, f, 0), jnp.float32)
                if self.output_format == "Magnitude"
                else jnp.zeros((b, f, 0, 2), jnp.float32))


class StreamingCQT(_StreamingFramed):
    """Chunked CQT1992v2 (``center=False``): the wavelet bank's width takes
    the role of ``n_fft`` — frame ``t`` spans ``x[t*hop : t*hop + width]``,
    so the same exact carry machinery applies (the bank width is set by
    ``Q*sr/fmin``, e.g. ~3.8k samples for 84 bins at 22050/32.7 Hz — the
    stream carries ceil((width-hop)/hop)*hop samples between chunks).

    Any :class:`~nnaudio_tpu.features.cqt.CQT1992v2` constructor argument
    is accepted (``center`` is forced False); ``output_format`` in
    {'Magnitude', 'Complex'}; chunks must be hop multiples."""

    def __init__(self, output_format: str = "Magnitude",
                 normalization_type: str = "librosa",
                 fuse: bool | None = None, **kwargs):
        from .features.cqt import CQT1992v2

        if output_format not in ("Magnitude", "Complex"):
            raise ValueError(
                "streaming supports output_format 'Magnitude' or 'Complex'"
            )
        kwargs.pop("center", None)
        self._cqt = CQT1992v2(center=False, output_format=output_format,
                              **kwargs)
        self.output_format = output_format
        self.normalization_type = normalization_type
        self._init_stream(self._cqt.kernel_width, self._cqt.hop_length,
                          self._cqt._params, fuse=fuse)

    def _apply_sig(self, params, sig):
        return self._cqt._forward(
            params, sig, output_format=self.output_format,
            normalization_type=self.normalization_type)

    def _empty_out(self, params, b):
        f = params["cqt_kernels_real"].shape[0]
        return (jnp.zeros((b, f, 0), jnp.float32)
                if self.output_format == "Magnitude"
                else jnp.zeros((b, f, 0, 2), jnp.float32))


class _StreamingFilterbank(_StreamingFramed):
    """Shared chunked machinery for filterbank spectrograms: Mel, Gammatone,
    Chroma, and MFCC are all frame-local projections of ``|STFT|^power``
    (plus an optional per-frame epilogue, :meth:`_post`). At the default
    ``power=2`` each step runs the SAME fused frame+DFT+power+projection
    composite as the offline transforms (ops/dispatch.framed_filterbank) —
    the magnitude spectrogram never exists in HBM on the latency-critical
    path; other powers take ``|STFT|^p`` then project. Chunk seams are
    exact (every stage is per-frame)."""

    def _init_filterbank(self, sr, n_fft, hop_length, window, power, basis,
                         verbose, fuse):
        self.power = power
        self._stft = STFT(n_fft=n_fft, hop_length=hop_length, window=window,
                          sr=sr, center=False, output_format="Magnitude",
                          verbose=verbose)
        params = dict(self._stft._params)
        params["basis"] = jnp.asarray(basis)
        self._init_stream(n_fft, hop_length, params, fuse=fuse)

    def _project(self, params, sig):
        from .config import dot_precision
        from .ops.dispatch import framed_filterbank

        if self.power == 2.0:
            return framed_filterbank(sig, params["wcos"], params["wsin"],
                                     params["basis"], self.hop, eps=0.0)
        mag = framed_magnitude(sig, params["wcos"], params["wsin"], self.hop,
                               eps=0.0)
        return jnp.einsum("gf,bft->bgt", params["basis"],
                          mag ** self.power, precision=dot_precision(),
                          preferred_element_type=jnp.float32)

    def _apply_sig(self, params, sig):
        return self._post(params, self._project(params, sig))

    def _post(self, params, out):  # per-frame epilogue; identity by default
        return out

    def _out_bins(self, params) -> int:
        return params["basis"].shape[0]

    def _empty_out(self, params, b):
        return jnp.zeros((b, self._out_bins(params), 0), jnp.float32)


class StreamingMel(_StreamingFilterbank):
    """Chunked MelSpectrogram (see :class:`_StreamingFilterbank`)."""

    def __init__(self, sr: float = 22050, n_fft: int = 2048,
                 hop_length: int = 512, n_mels: int = 128,
                 fmin: float = 0.0, fmax: float | None = None,
                 htk: bool = False, norm=1, window: str = "hann",
                 power: float = 2.0, verbose: bool = False,
                 fuse: bool | None = None):
        from .filters.mel import mel_filterbank

        basis = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk,
                               norm=norm)
        self._init_filterbank(sr, n_fft, hop_length, window, power, basis,
                              verbose, fuse)


class StreamingMFCC(_StreamingFilterbank):
    """Chunked MFCC: log-power Mel + DCT-II crop, per-frame, so chunk seams
    are exact — EXCEPT that the offline transform's ``top_db`` dynamic-range
    clamp thresholds against the WHOLE-signal batch max
    (features/mel.py:229-231), which no causal stream can know. Streaming
    therefore requires ``top_db=None`` (raises otherwise); offline
    equivalence target is ``MFCC(..., top_db=None, center=False)``."""

    def __init__(self, sr: float = 22050, n_mfcc: int = 20,
                 norm: str = "ortho", ref: float = 1.0, amin: float = 1e-10,
                 top_db: float | None = None, n_fft: int = 2048,
                 hop_length: int = 512, n_mels: int = 128,
                 fmin: float = 0.0, fmax: float | None = None,
                 htk: bool = False, mel_norm=1, window: str = "hann",
                 power: float = 2.0, verbose: bool = False,
                 fuse: bool | None = None):
        from .filters.mel import dct_matrix, mel_filterbank

        if top_db is not None:
            raise ValueError(
                "StreamingMFCC requires top_db=None: the offline top_db "
                "clamp thresholds against the whole-signal max, which a "
                "causal stream cannot know")
        if amin <= 0:
            raise ValueError("amin must be strictly positive")
        self.n_mfcc = n_mfcc
        self.amin = float(amin)
        self.ref = abs(float(ref))
        basis = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=htk,
                               norm=mel_norm)
        self._init_filterbank(sr, n_fft, hop_length, window, power, basis,
                              verbose, fuse)
        self._params["dct_basis"] = jnp.asarray(
            dct_matrix(n_mels, n_mels, norm=norm))

    def _post(self, params, mel):
        from .features.mel import mfcc_from_db, power_to_db

        db = power_to_db(mel, self.amin, self.ref, None)
        return mfcc_from_db(params["dct_basis"], db, self.n_mfcc)

    def _out_bins(self, params) -> int:
        return self.n_mfcc


class StreamingGammatone(_StreamingFilterbank):
    """Chunked Gammatonegram (see :class:`_StreamingFilterbank`). Defaults
    mirror :class:`~nnaudio_tpu.features.gammatone.Gammatonegram`."""

    def __init__(self, sr: float = 22050, n_fft: int = 2048,
                 hop_length: int = 512, n_bins: int = 64,
                 fmin: float = 0.0, fmax: float | None = None,
                 window: str = "hann", power: float = 2.0,
                 verbose: bool = False, fuse: bool | None = None):
        from .filters.gammatone import gammatone_filterbank

        basis = gammatone_filterbank(sr, n_fft, n_bins, fmin=fmin, fmax=fmax)
        self._init_filterbank(sr, n_fft, hop_length, window, power, basis,
                              verbose, fuse)


class StreamingChroma(_StreamingFilterbank):
    """Chunked ChromaSTFT. The librosa-convention per-frame norm (inf = max)
    is frame-local, so it streams exactly (unlike MFCC's top_db)."""

    def __init__(self, sr: float = 22050, n_fft: int = 2048,
                 hop_length: int = 512, n_chroma: int = 12,
                 tuning: float = 0.0, norm=jnp.inf, window: str = "hann",
                 power: float = 2.0, verbose: bool = False,
                 fuse: bool | None = None):
        from .filters.chroma import chroma_filterbank

        self.norm = norm
        basis = chroma_filterbank(sr, n_fft, n_chroma=n_chroma, tuning=tuning)
        self._init_filterbank(sr, n_fft, hop_length, window, power, basis,
                              verbose, fuse)

    def _post(self, params, chroma):
        from .features.chroma import normalize_frames

        return normalize_frames(chroma, self.norm)


class StreamingiSTFT:
    """Chunked overlap-add synthesis — the dual of :class:`StreamingSTFT`
    (``center=False``): consume ``(B, F, T, 2)`` onesided spectral chunks,
    emit samples the moment every frame overlapping them has arrived.

    Each chunk of ``T`` frames finalizes exactly ``T*hop`` samples (sample
    ``s`` is complete once frame ``floor(s/hop)`` has been consumed); the
    un-finalized ``n_fft - hop``-sample OLA tail and its window-envelope
    tail carry to the next step. Overlap-add and the envelope are linear,
    so ``concat(steps..., flush())`` equals the offline
    ``iSTFT(center=False)(X, onesided=True)`` output exactly.

    Together with :class:`StreamingSTFT` this closes a real-time
    analysis→modify→resynthesis loop with ``n_fft - hop`` samples of
    algorithmic latency.
    """

    def __init__(self, n_fft: int = 2048, hop_length: int | None = None,
                 win_length: int | None = None, window: str = "hann",
                 verbose: bool = False, fuse: bool | None = None):
        from .features.stft import hermitian_weights
        from .features import iSTFT

        self.fuse = fuse
        self._cache_warned = False

        self._ist = iSTFT(n_fft=n_fft, hop_length=hop_length,
                          win_length=win_length, window=window,
                          center=False, verbose=verbose)
        self.n_fft = n_fft
        self.hop = self._ist.stride
        if self.hop > n_fft:
            raise ValueError("hop_length > n_fft has gaps; cannot stream")
        p = self._ist._params
        f = n_fft // 2 + 1
        wt = hermitian_weights(n_fft, f)
        w = p["window_mask"]
        # onesided Hermitian-folded, fully weighted synthesis kernels
        self._kc = jnp.asarray(p["kernel_cos"][:f] * wt[:, None]
                               * w[None, :] / n_fft)
        self._ks = jnp.asarray(p["kernel_sin"][:f] * wt[:, None]
                               * w[None, :] / n_fft)
        self._window = jnp.asarray(w)
        self._jit_cache: dict = {}

    @property
    def overlap(self) -> int:
        return self.n_fft - self.hop

    def init_state(self, batch: int):
        """(OLA tail, envelope tail) — both un-normalized running sums."""
        return (jnp.zeros((batch, self.overlap), jnp.float32),
                jnp.zeros((self.overlap,), jnp.float32))

    def step(self, state, X):
        """``X``: (B, n_fft//2+1, T, 2) onesided frames (T >= 1); returns
        ``(new_state, samples)`` with ``samples`` shaped (B, T*hop)."""
        X = jnp.asarray(X)
        b, f, t = X.shape[0], X.shape[1], X.shape[2]
        if f != self.n_fft // 2 + 1:
            raise ValueError(
                f"expected {self.n_fft // 2 + 1} onesided bins, got {f}")
        from .config import cache_salt

        # synthesis_ola additionally reads the synthesis-kernel switch
        key = (b, t, self.fuse, cache_salt(("matmul_precision", "use_pallas",
                                            "use_pallas_synthesis")))
        fn = self._jit_cache.get(key)
        if fn is None:
            _warn_cache_growth(self)
            fn = jax.jit(self._make_step(t))
            self._jit_cache[key] = fn
        tail, env_tail = state
        with framed_matmul.force_fuse(self.fuse):
            new_tail, new_env, out = fn(tail, env_tail, X)
        return (new_tail, new_env), out

    def _make_step(self, t: int):
        from .core.overlap import (normalize_by_window_envelope,
                                   window_sumsquare)
        from .ops.dispatch import synthesis_ola

        hop, overlap = self.hop, self.overlap
        emit = t * hop
        kc, ks, window, n_fft = self._kc, self._ks, self._window, self.n_fft

        def step(tail, env_tail, X):
            sig = synthesis_ola(X[..., 0], X[..., 1], kc, ks, hop)
            env = window_sumsquare(window, t, hop, n_fft)
            if overlap:
                sig = sig.at[:, :overlap].add(tail)
                env = env.at[:overlap].add(env_tail)
            out = normalize_by_window_envelope(sig[:, :emit], env[:emit])
            return sig[:, emit:], env[emit:], out

        return step

    def flush(self, state):
        """Emit the final ``n_fft - hop`` tail samples after the last chunk."""
        from .core.overlap import normalize_by_window_envelope

        tail, env_tail = state
        return normalize_by_window_envelope(tail, env_tail)


class StreamingInverseCQT:
    """Chunked CQT-domain resynthesis — the dual of :class:`StreamingCQT`
    (``center=False``): consume ``(B, n_bins, T, 2)`` Complex CQT chunks,
    emit samples via canonical-dual synthesis
    (``CQT1992v2._dual_kernels``) the moment every frame overlapping them
    has arrived.

    Unlike :class:`StreamingiSTFT` there is no envelope-normalization
    carry at all: the dual atoms absorb the frame-operator inverse, so the
    step is pure matmul+OLA and ``concat(steps..., flush())`` equals the
    offline ``CQT1992v2(center=False).inverse(X)`` output exactly (OLA is
    linear). Together with :class:`StreamingCQT` this closes a real-time
    CQT-domain analyze→modify→resynthesize loop with
    ``kernel_width - hop`` samples of algorithmic latency — the long
    low-frequency atoms make that inherently larger than the STFT loop's
    (e.g. ~8k samples ≈ 370 ms at 22.05 kHz for a 48-bin fmin=55 bank).

    Same quality contract as the offline inverse: keep ``hop_length`` at
    or below half the shortest atom or the top octave aliases (warned).
    """

    def __init__(self, sr: float = 22050, hop_length: int = 512,
                 fmin: float = 32.70, fmax: float | None = None,
                 n_bins: int = 84, bins_per_octave: int = 12,
                 filter_scale: float = 1, norm: float = 1,
                 window="hann", normalization_type: str = "librosa",
                 band_eta: float = 1e-3, verbose: bool = False,
                 fuse: bool | None = None):
        from .features.cqt import (CQT1992v2, _check_norm_type,
                                   _warn_undersampled_hop)

        _check_norm_type(normalization_type)
        self.fuse = fuse
        self._cache_warned = False
        cqt = CQT1992v2(sr=sr, hop_length=hop_length, fmin=fmin, fmax=fmax,
                        n_bins=n_bins, bins_per_octave=bins_per_octave,
                        filter_scale=filter_scale, norm=norm, window=window,
                        center=False, output_format="Complex",
                        verbose=verbose)
        self.n_bins = cqt._params["cqt_kernels_real"].shape[0]
        self.kernel_width = cqt.kernel_width
        self.hop = hop_length
        if self.hop > self.kernel_width:
            raise ValueError("hop_length > kernel_width has gaps; cannot "
                             "stream")
        _warn_undersampled_hop(hop_length, cqt._params["lenghts"],
                               "StreamingInverseCQT")
        self._kc, self._ks = cqt._dual_kernels(normalization_type, band_eta)
        self._jit_cache: dict = {}

    @property
    def overlap(self) -> int:
        return self.kernel_width - self.hop

    def init_state(self, batch: int):
        """The un-finalized OLA tail (an un-normalized running sum)."""
        return jnp.zeros((batch, self.overlap), jnp.float32)

    def step(self, state, X):
        """``X``: (B, n_bins, T, 2) Complex CQT frames (T >= 1); returns
        ``(new_state, samples)`` with ``samples`` shaped (B, T*hop)."""
        X = jnp.asarray(X)
        if X.ndim != 4 or X.shape[-1] != 2:
            raise ValueError(
                "step expects Complex format (batch, n_bins, time, 2); for "
                "magnitude CQTs use features.GriffinLimCQT (offline)")
        b, f, t = X.shape[0], X.shape[1], X.shape[2]
        if f != self.n_bins:
            raise ValueError(f"expected {self.n_bins} bins, got {f}")
        from .config import cache_salt

        key = (b, t, self.fuse, cache_salt(("matmul_precision", "use_pallas",
                                            "use_pallas_synthesis")))
        fn = self._jit_cache.get(key)
        if fn is None:
            _warn_cache_growth(self)
            fn = jax.jit(self._make_step(t))
            self._jit_cache[key] = fn
        with framed_matmul.force_fuse(self.fuse):
            new_tail, out = fn(state, X)
        return new_tail, out

    def _make_step(self, t: int):
        from .ops.dispatch import synthesis_ola

        hop, overlap = self.hop, self.overlap
        emit = t * hop
        kc, ks = self._kc, self._ks

        def step(tail, X):
            sig = synthesis_ola(X[..., 0], X[..., 1], kc, ks, hop)
            if overlap:
                sig = sig.at[:, :overlap].add(tail)
            return sig[:, emit:], sig[:, :emit]

        return step

    def flush(self, state):
        """Emit the final ``kernel_width - hop`` tail samples."""
        return state
