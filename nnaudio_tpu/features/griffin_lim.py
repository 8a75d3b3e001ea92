"""Fast Griffin-Lim phase recovery as an on-device fixed-point loop.

TPU-native rebuild of ``/root/reference/Installation/nnAudio/features/griffin_lim.py``:
the reference loops ``torch.istft -> torch.stft -> momentum phase update`` in
Python (griffin_lim.py:105-137); here the whole iteration runs inside one
``lax.fori_loop`` under ``jit``, with our own basis-matmul STFT/iSTFT (the
reference's own TODO notes these were its only non-self-hosted transforms).
Randomness is an explicit ``jax.random`` key (replaces ``torch.randn``,
griffin_lim.py:97-100; the legacy ``device`` argument is accepted and ignored).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.frame import pad_signal
from ..core.overlap import normalize_by_window_envelope, window_sumsquare
from ..filters.fourier import create_fourier_basis
from ..filters.windows import pad_center, window_dispatch
from ..ops.dispatch import framed_basis_pair, synthesis_ola
from .base import SpectralTransform


class Griffin_Lim(SpectralTransform):
    """Fast Griffin-Lim phase recovery from a magnitude spectrogram.

    Iterates iSTFT → STFT → momentum phase update entirely on device inside
    one ``lax.fori_loop`` (the reference loops in Python,
    griffin_lim.py:105-137). Randomness is an explicit ``jax.random`` key;
    results are deterministic given the key.

    Parameters
    ----------
    n_fft : int
        Size of the Fourier transform the magnitudes were produced with.
    n_iter : int
        Number of fixed-point iterations. Default 32.
    hop_length : int or None
        Hop size of the forward STFT. Default ``None`` — ``n_fft//4``.
    win_length : int or None
        Window length. Default ``None`` — ``n_fft``.
    window : str
        Window function (``scipy.signal.get_window``). Default ``'hann'``.
    center : bool
        Whether the forward STFT was centered. Default ``True``.
    pad_mode : {'reflect', 'constant'}
        Padding used by the in-loop analysis STFT. Default ``'reflect'``.
    momentum : float
        Momentum of the fast Griffin-Lim update (0 = classic Griffin-Lim).
        Default 0.99.
    device : str or None
        Accepted for reference API parity; placement is JAX's concern here.
    iter_precision : {'default', 'highest'}
        Matmul precision for the in-loop transform pair. Griffin-Lim is a
        fixed-point projection — every iteration re-imposes the target
        magnitudes, so per-iteration rounding does not accumulate;
        ``'default'`` (bf16 multiplies) roughly doubles TPU throughput at
        measured-equal reconstruction SNR. The final synthesis always runs
        at the ambient config precision, and this flag never *raises*
        precision above the ambient setting. Default ``'default'``.

    Returns
    -------
    waveform : jax.Array
        ``(num_audio, (time_steps - 1) * hop_length)`` when centered. Call
        as ``gl(S)`` or ``gl(S, key=jax.random.PRNGKey(k))`` with ``S`` of
        shape ``(num_audio, n_fft//2 + 1, time_steps)``.

    Examples
    --------
    >>> S = STFT(1024, hop_length=256, output_format="Magnitude")(x)
    >>> rec = Griffin_Lim(n_fft=1024, hop_length=256)(S)
    """

    _salt_fields = ('matmul_precision', 'use_pallas', 'use_pallas_synthesis')

    def __init__(
        self,
        n_fft: int,
        n_iter: int = 32,
        hop_length: int | None = None,
        win_length: int | None = None,
        window: str = "hann",
        center: bool = True,
        pad_mode: str = "reflect",
        momentum: float = 0.99,
        device: str | None = None,  # accepted for API parity; unused
        iter_precision: str = "default",
    ):
        super().__init__()
        if iter_precision not in ("default", "highest"):
            raise ValueError(f"unknown iter_precision {iter_precision!r}")
        self.iter_precision = iter_precision
        self.n_fft = n_fft
        self.n_iter = n_iter
        self.center = center
        self.pad_mode = pad_mode
        self.momentum = momentum
        self.win_length = n_fft if win_length is None else win_length
        self.hop_length = n_fft // 4 if hop_length is None else hop_length
        self.pad_amount = n_fft // 2

        basis = create_fourier_basis(n_fft, win_length=self.win_length,
                                     freq_bins=None, window=window)
        w = pad_center(
            window_dispatch(window, int(self.win_length), fftbins=True), n_fft
        ).astype(np.float32)
        self._register("wsin", basis.wsin * w[None, :])
        self._register("wcos", basis.wcos * w[None, :])
        # onesided IDFT kernels with Hermitian fold weights (DC/Nyquist x1,
        # interior x2) — half the synthesis matmul of a mirrored full bank
        from .stft import hermitian_weights

        wt = np.asarray(hermitian_weights(n_fft, basis.wcos.shape[0]))[:, None]
        self._register("kernel_sin_inv", basis.wsin * wt)
        self._register("kernel_cos_inv", basis.wcos * wt)
        self._register("window_mask", w)

    # --------------------------------------------------------------- graph --
    def _forward_fused(self, params, S, rand_phase, mom, plan):
        """GL loop with the fused Pallas analysis step (see _forward).

        The loop state lives at the kernel's padded shape
        ``(B, f_padded, t_padded)``; the synthesis kernels get matching
        zero rows (their contraction already runs at the padded F
        internally, so this costs nothing), and the one extra time frame's
        carry is exactly zero because its S column is zero."""
        from ..config import set_matmul_precision, get_config
        from ..ops.framed_matmul import _framed_gl_step

        b, f, t = S.shape
        fp, tp = plan["f_padded"], plan["t_padded"]
        hop = self.hop_length
        highest = self.iter_precision == "highest"
        carry = jnp.float32 if highest else jnp.bfloat16
        static_plan = {k: plan[k] for k in
                       ("w", "q", "n_chunks", "tile_t", "tile_f", "bb",
                        "slab_rows", "t_padded", "f_padded")}
        static_plan["highest"] = highest

        S_pad = jnp.pad(S, ((0, 0), (0, fp - f), (0, tp - t)))
        rp = jnp.pad(rand_phase, ((0, 0), (0, fp - f), (0, tp - t)))
        c_re = (S_pad * jnp.cos(2 * np.pi * rp)).astype(carry)
        c_im = (S_pad * jnp.sin(2 * np.pi * rp)).astype(carry)

        w = params["window_mask"][None, :] / self.n_fft
        kc = jnp.pad(params["kernel_cos_inv"] * w, ((0, fp - f), (0, 0)))
        ks = jnp.pad(params["kernel_sin_inv"] * w, ((0, fp - f), (0, 0)))
        wcos_t = params["wcos"].T.astype(jnp.float32)
        wsin_t = params["wsin"].T.astype(jnp.float32)
        # envelope over the TRUE t frames only, extended with ones across the
        # phantom padded frames: their spectra are zero, so their synthesis
        # contribution is zero and dividing by 1 keeps it zero — whereas a
        # tp-frame sumsquare would also add phantom window energy over the
        # real signal's last n_fft - hop samples (frames overlap) and
        # attenuate the tail every iteration vs the non-fused loop.
        w_sum_t = window_sumsquare(params["window_mask"], t, hop, self.n_fft)
        w_sum = jnp.pad(w_sum_t, (0, hop * (tp - t)), constant_values=1.0)

        # true/padded synthesized lengths: the center trim + reflect re-pad
        # must happen at the TRUE length (the reference's istft->stft
        # convention trims n_fft//2 real samples off both ends), then
        # zero-extend back to the plan length — trimming the padded signal
        # directly would keep pad_amount extra real tail samples and give
        # tail frames leftover zeros where the reflect pad belongs.
        len_t = self.n_fft + hop * (t - 1)
        len_tp = self.n_fft + hop * (tp - 1)

        def body(_, carryv):
            c_re, c_im, p_re, p_im = carryv
            signal = synthesis_ola(c_re, c_im, kc, ks, hop)
            signal = normalize_by_window_envelope(signal, w_sum)
            if self.center:
                signal = signal[:, self.pad_amount : len_t - self.pad_amount]
                signal = pad_signal(signal, self.pad_amount, self.pad_mode)
                signal = jnp.pad(signal, ((0, 0), (0, len_tp - len_t)))
            return _framed_gl_step(signal, wcos_t, wsin_t, S_pad, p_re, p_im,
                                   hop, mom=mom, **static_plan)

        # trace the in-loop synthesis at iter_precision (the analysis half's
        # precision is fixed by the kernel's `highest` static)
        prev = get_config().matmul_precision
        loop_prec = "highest" if highest else "default"
        if prev != loop_prec:
            set_matmul_precision(loop_prec)
        try:
            c_re, c_im, _, _ = jax.lax.fori_loop(
                0, self.n_iter, body,
                (c_re, c_im, jnp.zeros_like(c_re), jnp.zeros_like(c_im)),
            )
        finally:
            set_matmul_precision(prev)

        # final synthesis at the ambient precision on the unpadded view
        return self._istft_planar(
            params,
            c_re[:, :f, :t].astype(jnp.float32),
            c_im[:, :f, :t].astype(jnp.float32),
            w_sum_t,
        )

    def _istft_planar(self, params, spec_re, spec_im, w_sum):
        """Planar (B, F, T) re/im variant of :meth:`_istft` — the loop keeps
        real and imaginary parts as separate arrays: the torch-convention
        ``(..., 2)`` stack puts 2 elements in the 128-lane minor dim, and
        every elementwise pass over it runs at ~2% lane utilization
        (measured: the momentum+normalize step alone cost 3.3 ms/iter in
        stacked form)."""
        w = params["window_mask"][None, :] / self.n_fft
        signal = synthesis_ola(
            spec_re, spec_im,
            params["kernel_cos_inv"] * w, params["kernel_sin_inv"] * w,
            self.hop_length,
        )
        signal = normalize_by_window_envelope(signal, w_sum)
        if self.center:
            return signal[:, self.pad_amount : -self.pad_amount]
        return signal

    def _forward(self, params, S, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        b, f, t = S.shape
        rand_phase = jax.random.normal(key, (b, f, t))
        mom = self.momentum / (1 + self.momentum)

        # Fused-step path (TPU, bf16 iterations): the whole analysis half of
        # each iteration — frame + DFT pair + momentum + normalize + S-scale
        # — runs as ONE Pallas kernel emitting the next carries directly
        # (the XLA elementwise chain between the pair and the carries
        # measured 0.64 ms/iter, 18% of the iteration, and does not
        # auto-fuse). The loop then runs entirely on (B, f_padded, t_padded)
        # carries: padding happens once out here, padded S columns/rows are
        # zero so padded carries stay exactly zero through the fixed point,
        # and the synthesis kernel contracts the padded rows at zero extra
        # cost (it pads F internally anyway).
        from ..config import get_config, on_tpu, set_matmul_precision
        from ..ops.framed_matmul import gl_step_plan

        cfg = get_config()
        plan = None
        # tensorfloat32 asks ~1e-4 iteration numerics; the fused step's bf16
        # carries deliver ~2e-3, so tf32 keeps the XLA loop (same contract as
        # the analysis/synthesis kernels' tf32 gates in ops/dispatch.py).
        # iter_precision='highest' keeps the XLA loop: the fp32 variant of
        # the fused step (chunked-K HIGHEST dots, fp32 carries) was built
        # for round-4 VERDICT item 6 and measured 0.86x the XLA chain
        # on-chip (121.5 vs 104.2 ms/batch, tools/profile_r4_chain.py) —
        # the chunked-K plan's extra VMEM round trips outweigh the saved
        # elementwise chain at fp32 cost. The kernel remains exactness-
        # tested (tests/test_ops.py) and callable via _forward_fused with
        # a highest=True plan for experiments.
        if (on_tpu() and cfg.use_pallas
                and cfg.matmul_precision != "tensorfloat32"
                and self.iter_precision == "default"):
            sig_len = self.n_fft + self.hop_length * (t - 1)
            plan = gl_step_plan(b, sig_len, f, self.n_fft, self.hop_length)
        if plan is not None:
            return self._forward_fused(params, S, rand_phase, mom, plan)

        w_sum = window_sumsquare(
            params["window_mask"], t, self.hop_length, self.n_fft
        )
        # the loop carries c = S * a (the magnitude-imposed spectrum)
        # directly rather than the unit phasor a: the synthesis kernel then
        # consumes the carry as-is, and the S multiply rides the fused
        # normalize chain (scale = S/|n|) instead of being a separate
        # read-S-read-a-write pass over (B, F, T) x2 per iteration.
        # In the bf16 iter mode the carries are also STORED bf16 — GL is a
        # fixed-point projection (rounding does not accumulate; SNR-tested),
        # and halving the carry bytes halves the loop's elementwise and
        # kernel-input HBM traffic.
        prev = cfg.matmul_precision
        carry_dtype = (jnp.bfloat16 if self.iter_precision == "default"
                       else jnp.float32)
        c_re = (S * jnp.cos(2 * np.pi * rand_phase)).astype(carry_dtype)
        c_im = (S * jnp.sin(2 * np.pi * rand_phase)).astype(carry_dtype)

        def body(_, carry):
            c_re, c_im, p_re, p_im = carry
            inverse = self._istft_planar(params, c_re, c_im, w_sum)
            if self.center:
                inverse = pad_signal(inverse, self.pad_amount, self.pad_mode)
            r_re, r_im_raw = framed_basis_pair(
                inverse, params["wcos"], params["wsin"], self.hop_length
            )
            r_im = -r_im_raw
            n_re = r_re - mom * p_re.astype(jnp.float32)
            n_im = r_im - mom * p_im.astype(jnp.float32)
            scale = S * jax.lax.rsqrt(n_re * n_re + n_im * n_im + 1e-32)
            return ((n_re * scale).astype(carry_dtype),
                    (n_im * scale).astype(carry_dtype),
                    r_re.astype(carry_dtype), r_im.astype(carry_dtype))

        # trace the loop body at iter_precision (without ever raising the
        # ambient setting); the final synthesis below re-traces at ambient
        if prev == "highest" and self.iter_precision == "default":
            set_matmul_precision("default")
        try:
            c_re, c_im, _, _ = jax.lax.fori_loop(
                0, self.n_iter, body,
                (c_re, c_im, jnp.zeros_like(c_re), jnp.zeros_like(c_im)),
            )
        finally:
            set_matmul_precision(prev)
        return self._istft_planar(
            params, c_re.astype(jnp.float32), c_im.astype(jnp.float32), w_sum)

    def __call__(self, S, key=None):
        return self.apply(None, S, key=key)

    def apply(self, params, S, key=None):
        merged = dict(self._params)
        if params:
            merged.update(params)
        S = jnp.asarray(S)
        if S.ndim != 3:
            raise AssertionError(
                "Please make sure your input is in the shape of "
                "(batch, freq_bins, timesteps)"
            )
        from ..config import cache_salt

        cache_key = ("gl", cache_salt(self._salt_fields))
        fn = self._jit_cache.get(cache_key)
        if fn is None:
            fn = jax.jit(self._forward)
            self._jit_cache[cache_key] = fn
        if key is None:
            key = jax.random.PRNGKey(0)
        return fn(merged, S, key)
