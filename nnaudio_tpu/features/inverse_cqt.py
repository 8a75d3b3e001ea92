"""Magnitude-CQT → waveform: Griffin-Lim over the CQT frame
(beyond-reference capability).

librosa has ``griffinlim_cqt`` (a Python loop of ``icqt``/``cqt`` calls);
the reference (nnAudio) has no way back from a CQT at all. This is the
TPU-native design, mirroring :class:`~nnaudio_tpu.features.griffin_lim.Griffin_Lim`:
the whole fixed-point iteration — canonical-dual synthesis (one fused
matmul+OLA, ops/dispatch.synthesis_ola), re-analysis (the framed basis
pair), momentum phase update — runs inside one ``lax.fori_loop`` under
``jit`` on planar (B, F, T) carries. Unlike the STFT loop there is no
window-sumsquare normalization step at all: the dual synthesis kernels
(features/cqt.py ``_dual_kernels``) absorb the frame-operator inverse, so
the per-iteration elementwise chain is shorter than the STFT GL's.

The reconstruction-quality limits are the inverse's, not the loop's (see
``CQT1992v2.inverse``): keep ``hop_length`` at or below half the shortest
atom (``lenghts.min()/2``) or the top octave's envelopes alias.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.dispatch import framed_basis_pair, synthesis_ola
from .base import SpectralTransform
from .cqt import CQT1992v2, _center_pad, _check_norm_type


class GriffinLimCQT(SpectralTransform):
    """Griffin-Lim phase recovery from a magnitude CQT (CQT1992v2 frame).

    Parameters mirror :class:`~nnaudio_tpu.features.cqt.CQT1992v2` (the
    analysis bank is shared) plus the Griffin-Lim knobs of
    :class:`~nnaudio_tpu.features.griffin_lim.Griffin_Lim`.

    Parameters
    ----------
    sr, hop_length, fmin, fmax, n_bins, bins_per_octave, filter_scale,
    norm, window, pad_mode
        The parameters the magnitude CQT was produced with
        (``center=True`` is assumed, as in the forward's default).
    n_iter : int
        Fixed-point iterations. Default 32.
    momentum : float
        Fast-Griffin-Lim momentum (0 = classic). Default 0.99.
    normalization_type : {'librosa', 'convolutional', 'wrap'}
        The normalization the input magnitudes carry. Default
        ``'librosa'``.
    band_eta : float
        Regularization floor of the dual construction (see
        ``CQT1992v2._dual_kernels``). Default 1e-3.
    iter_precision : {'default', 'highest'}
        Matmul precision for the in-loop transform pair; same contract as
        ``Griffin_Lim`` (a fixed-point projection re-imposes the target
        magnitudes every iteration, so bf16 multiplies cost no SNR;
        never raises precision above the ambient config).
    family : {'1992v2', '2010v2', 'vqt'}
        Which CQT the magnitudes came from. The pyramid families iterate
        the full multirate forward against the collapsed single-rate dual
        synthesis (``_PyramidCQT._pyramid_dual_kernels``); extra ctor
        arguments (``gamma``, ``earlydownsample``, ...) pass through.
    verbose : bool
        Print kernel-construction info. Default ``True``.

    Returns
    -------
    waveform : jax.Array
        ``(num_audio, hop_length * (time_steps - 1))`` (or ``length`` if
        given). Call as ``gl(S)`` or ``gl(S, key=jax.random.PRNGKey(k))``
        with ``S`` of shape ``(num_audio, n_bins, time_steps)``.

    Examples
    --------
    >>> cqt = CQT1992v2(sr=22050, hop_length=128, fmin=55, n_bins=48)
    >>> rec = GriffinLimCQT(sr=22050, hop_length=128, fmin=55,
    ...                     n_bins=48)(cqt(x))
    """

    _salt_fields = ("matmul_precision", "use_pallas", "use_pallas_synthesis")

    def __init__(
        self,
        sr: float = 22050,
        hop_length: int = 512,
        fmin: float = 32.70,
        fmax: float | None = None,
        n_bins: int = 84,
        bins_per_octave: int = 12,
        filter_scale: float = 1,
        norm: float = 1,
        window="hann",
        pad_mode: str = "reflect",
        n_iter: int = 32,
        momentum: float = 0.99,
        normalization_type: str = "librosa",
        band_eta: float = 1e-3,
        iter_precision: str = "default",
        family: str = "1992v2",
        verbose: bool = True,
        **family_kwargs,
    ):
        super().__init__()
        if iter_precision not in ("default", "highest"):
            raise ValueError(f"unknown iter_precision {iter_precision!r}")
        _check_norm_type(normalization_type)
        self.iter_precision = iter_precision
        self.n_iter = n_iter
        self.momentum = momentum
        self.hop_length = hop_length
        self.pad_mode = pad_mode
        self.normalization_type = normalization_type
        self.family = family

        common = dict(sr=sr, hop_length=hop_length, fmin=fmin, fmax=fmax,
                      n_bins=n_bins, bins_per_octave=bins_per_octave,
                      filter_scale=filter_scale, output_format="Complex",
                      verbose=verbose, pad_mode=pad_mode, **family_kwargs)
        if family == "1992v2":
            self._cqt = CQT1992v2(norm=norm, window=window, center=True,
                                  **common)
        elif family in ("2010v2", "vqt"):
            # the pyramid classes take `norm` as a bool and `basis_norm`
            # as the Lp construction norm; window is fixed by the bank
            from .cqt import CQT2010v2
            from .vqt import VQT

            cls = CQT2010v2 if family == "2010v2" else VQT
            self._cqt = cls(basis_norm=norm, window=window, **common)
            # the loop reads the pyramid-path config switches at trace time
            self._salt_fields = ("matmul_precision", "use_pallas",
                                 "use_pallas_synthesis", "use_fused_pyramid",
                                 "use_parallel_chain")
        else:
            raise ValueError(
                f"unknown family {family!r}: '1992v2', '2010v2' or 'vqt'")
        self._params.update(self._cqt._params)
        self._band_eta = band_eta
        self._rebuild_duals()
        from .cqt import _warn_undersampled_hop

        _warn_undersampled_hop(self._cqt.hop_length,
                               self._params["lenghts"], "GriffinLimCQT")

    def _rebuild_duals(self):
        """(Re)build the synthesis duals + analysis scale from the inner
        transform's CURRENT kernels, mirror its derived arrays (the pyramid
        cascades, consumed by the in-loop forward), and drop compiled steps
        that captured the old duals as closure constants."""
        self._derived = dict(self._cqt._derived)
        if self.family == "1992v2":
            self.kernel_width = self._cqt.kernel_width
            self.pad_amount = self.kernel_width // 2
            kc, ks = self._cqt._dual_kernels(self.normalization_type,
                                             self._band_eta)
            self._dual_kc, self._dual_ks = kc, ks
            self._ascale = jnp.asarray(
                self._cqt._norm_scale_np(self.normalization_type),
                jnp.float32)
            self._hop_syn = self._cqt.hop_length
        else:
            kc, ks, start, hop_top = self._cqt._pyramid_dual_kernels(
                self.normalization_type, self._band_eta)
            self._dual_kc, self._dual_ks = kc, ks
            self._syn_start = start
            self._hop_syn = hop_top
        self._jit_cache.clear()

    def _refresh_derived(self, changed):
        # a persistent kernel update must reach BOTH halves of the fixed
        # point: push shared keys into the inner transform (clearing its
        # dual caches / recomposing its cascades) and rebuild this loop's
        # synthesis duals — otherwise analysis (merged params) and
        # synthesis (init-time duals) silently desynchronize
        if not changed:
            return
        shared = {k: self._params[k] for k in changed
                  if k in self._cqt._params}
        if shared:
            self._cqt.update_params(shared)
        self._rebuild_duals()

    def _rederive(self, merged, overridden):
        # apply-time overrides flow to the inner transform's derivation
        # rules (e.g. in-graph cascade recomposition for the pyramid chain)
        return self._cqt._rederive(merged, overridden)

    # --------------------------------------------------------------- graph --
    def _synthesize(self, c_re, c_im, t):
        """Dual synthesis + trim: (B, F, T) carries -> (B, hop_syn*(T-1))."""
        sig = synthesis_ola(c_re, c_im, self._dual_kc, self._dual_ks,
                            self._hop_syn)
        if self.family == "1992v2":
            len_full = self.kernel_width + self._hop_syn * (t - 1)
            return sig[:, self.pad_amount: len_full - self.pad_amount]
        return sig[:, self._syn_start: self._syn_start
                   + self._hop_syn * (t - 1)]

    def _forward(self, params, S, key=None):
        from ..config import get_config, set_matmul_precision

        if key is None:
            key = jax.random.PRNGKey(0)
        b, f, t = S.shape
        rand_phase = jax.random.normal(key, (b, f, t))
        mom = self.momentum / (1 + self.momentum)

        # the loop's re-analysis must reproduce the Complex forward's
        # convention so the carries stay in the same frame as the dual
        # synthesis kernels. 1992v2: one basis pair with the normalization
        # folded into the kernels (planar, no stack). Pyramid families:
        # the full (jit-clean) pyramid forward, split back to planar.
        if self.family == "1992v2":
            s = self._ascale[:, None]
            akr = params["cqt_kernels_real"] * s
            aki = params["cqt_kernels_imag"] * s

            def analyze(sig):
                # same constant-pad fallback as the forward (features/
                # cqt.py:341): short clips whose synthesis is shorter than
                # the reflect pad must still be re-analyzable in the loop
                sig = _center_pad(sig, self.pad_amount, self.pad_mode)
                r_re, r_im_raw = framed_basis_pair(sig, akr, aki,
                                                   self.hop_length)
                return r_re, -r_im_raw
        else:
            def analyze(sig):
                C = self._cqt._forward(
                    params, sig, output_format="Complex",
                    normalization_type=self.normalization_type)
                return C[..., 0], C[..., 1]

        cfg = get_config()
        prev = cfg.matmul_precision
        carry_dtype = (jnp.bfloat16 if self.iter_precision == "default"
                       else jnp.float32)
        # carry c = S·phase directly (the S multiply rides the normalize
        # chain), planar re/im — same layout lessons as Griffin_Lim
        c_re = (S * jnp.cos(2 * np.pi * rand_phase)).astype(carry_dtype)
        c_im = (S * jnp.sin(2 * np.pi * rand_phase)).astype(carry_dtype)

        def body(_, carry):
            c_re, c_im, p_re, p_im = carry
            inverse = self._synthesize(c_re, c_im, t)
            r_re, r_im = analyze(inverse)
            n_re = r_re - mom * p_re.astype(jnp.float32)
            n_im = r_im - mom * p_im.astype(jnp.float32)
            scale = S * jax.lax.rsqrt(n_re * n_re + n_im * n_im + 1e-32)
            return ((n_re * scale).astype(carry_dtype),
                    (n_im * scale).astype(carry_dtype),
                    r_re.astype(carry_dtype), r_im.astype(carry_dtype))

        if prev == "highest" and self.iter_precision == "default":
            set_matmul_precision("default")
        try:
            c_re, c_im, _, _ = jax.lax.fori_loop(
                0, self.n_iter, body,
                (c_re, c_im, jnp.zeros_like(c_re), jnp.zeros_like(c_im)),
            )
        finally:
            set_matmul_precision(prev)
        # final synthesis at the ambient precision
        return self._synthesize(c_re.astype(jnp.float32),
                                c_im.astype(jnp.float32), t)

    def __call__(self, S, key=None, length=None):
        out = self.apply(None, jnp.asarray(S), key=key)
        if length is not None:
            out = out[:, :length]
            if out.shape[-1] < length:
                out = jnp.pad(out, ((0, 0), (0, length - out.shape[-1])))
        return out

    def apply(self, params, S, key=None):
        merged = dict(self._params)
        merged.update(self._derived)
        if params:
            # apply-time overrides reach only the in-loop RE-ANALYSIS; the
            # synthesis duals are host-built fp64 arrays (_rebuild_duals)
            # that cannot be rederived from traced values. Allowing a
            # kernel override here would silently iterate between two
            # different frames — reject it and point at the supported
            # route (update_params rebuilds both halves).
            shared = sorted(k for k in params if k in self._cqt._params)
            if shared:
                raise ValueError(
                    "GriffinLimCQT.apply() cannot take overrides for "
                    f"analysis-bank parameters {shared}: the synthesis "
                    "duals are derived from them outside the graph. Use "
                    "update_params({...}) to change the bank (it rebuilds "
                    "the duals), then call apply(None, S)."
                )
            merged.update(params)
            merged = self._rederive(merged, frozenset(params))
        S = jnp.asarray(S)
        if S.ndim != 3:
            raise AssertionError(
                "Please make sure your input is in the shape of "
                "(num_audio, n_bins, time_steps)"
            )
        from ..config import cache_salt

        jkey = (S.shape, cache_salt(self._salt_fields))
        fn = self._jit_cache.get(jkey)
        if fn is None:
            fn = jax.jit(self._forward)
            self._jit_cache[jkey] = fn
        if key is None:
            key = jax.random.PRNGKey(0)
        return fn(merged, S, key=key)

    def extra_repr(self) -> str:
        return f"n_iter = {self.n_iter}, momentum = {self.momentum}"
