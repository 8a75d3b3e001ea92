"""Transform base class: pytree parameters + cached jitted forwards.

Replaces the reference's ``nn.Module`` buffer/parameter machinery
(``stft.py:234-245``) with a functional design: each transform owns a dict of
``jnp`` arrays (its basis kernels), a set of trainable names, and compiles its
forward once per static-kwarg combination. Gradients flow through
``transform.apply(params, x)`` with any subset of parameters overridden.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp


class SpectralTransform:
    """Base for all feature transforms.

    Subclasses populate parameters in ``__init__`` via :meth:`_register` and
    implement ``_forward(params, x, **static_kwargs)`` with jit-clean code.
    """

    #: config switches this transform's traced graph reads — the jit-cache
    #: key salts on exactly these (config.cache_salt), so an unrelated
    #: toggle does not retrace/recompile it. The base default is the full
    #: set (safe for any subclass); concrete transforms narrow it.
    _salt_fields: tuple = ("matmul_precision", "use_pallas",
                           "use_pallas_analysis", "use_pallas_synthesis",
                           "use_fused_pyramid", "use_mxu_fft",
                           "use_parallel_chain")

    def __init__(self) -> None:
        self._params: dict[str, jax.Array] = {}
        #: arrays that are pure functions of entries in ``_params`` (e.g.
        #: the pyramid's composed cascade filters): fed to the forward like
        #: parameters, but never saved/loaded as state — recomputed via the
        #: :meth:`_refresh_derived` / :meth:`_rederive` hooks instead.
        self._derived: dict[str, jax.Array] = {}
        self._trainable: set[str] = set()
        self._jit_cache: dict[Any, Callable] = {}

    # ------------------------------------------------------------- params --
    def _register(self, name: str, value, trainable: bool = False) -> jax.Array:
        arr = jnp.asarray(value)
        self._params[name] = arr
        if trainable:
            self._trainable.add(name)
        return arr

    @property
    def params(self) -> dict[str, jax.Array]:
        """All parameters (frozen buffers and trainable kernels alike).
        State only — derived arrays are excluded (see
        :attr:`forward_params`)."""
        return dict(self._params)

    @property
    def forward_params(self) -> dict[str, jax.Array]:
        """Everything the jitted ``_forward`` consumes: state parameters
        plus the derived (recomputed, never-saved) arrays. External callers
        that build a params pytree for ``_forward`` directly (e.g. the
        ``parallel`` wrappers) must use this, not :attr:`params`."""
        return {**self._params, **self._derived}

    def trainable_params(self) -> dict[str, jax.Array]:
        """The subset of :attr:`params` marked trainable — feed to jax.grad
        / optax."""
        return {k: v for k, v in self._params.items() if k in self._trainable}

    def update_params(self, new_params: Mapping[str, Any]) -> None:
        """Write updated (e.g. optimizer-stepped) parameters back in place."""
        for k, v in new_params.items():
            if k not in self._params:
                raise KeyError(f"unknown parameter {k!r}")
            self._params[k] = jnp.asarray(v)
        self._refresh_derived(set(new_params))

    # ------------------------------------------------------------ derived --
    def _refresh_derived(self, changed: set) -> None:
        """Hook: recompute :attr:`_derived` after the named parameters were
        persistently updated (update_params / load_state_dict). Default:
        nothing is derived."""

    def _rederive(self, merged: dict, overridden: frozenset) -> dict:
        """Hook: recompute derived entries of ``merged`` when an apply-time
        parameter override invalidates them. Unlike
        :meth:`_refresh_derived` this may see tracers (overrides passed
        under jit/grad), so implementations must be jnp-traceable."""
        return merged

    # ------------------------------------------------------------ forward --
    def _forward(self, params: Mapping[str, jax.Array], x: jax.Array, **kw):
        raise NotImplementedError

    def apply(self, params: Mapping[str, jax.Array] | None, x, **static_kwargs):
        """Functional forward: ``params`` (possibly a partial override, e.g.
        just the trainable subset) applied over the stored parameters."""
        merged = dict(self._params)
        merged.update(self._derived)
        if params:
            merged.update(params)
            merged = self._rederive(merged, frozenset(params))
        x = jnp.asarray(x)
        from ..config import cache_salt

        # config state is part of the key: precision / pallas switches are
        # captured at trace time, so a stale cached graph would silently
        # ignore e.g. fast_mode() entered after the first call
        key = (cache_salt(self._salt_fields),
               tuple(sorted(static_kwargs.items())))
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(self._forward, **static_kwargs))
            self._jit_cache[key] = fn
        return fn(merged, x)

    def __call__(self, x, **static_kwargs):
        return self.apply(None, x, **static_kwargs)

    # -------------------------------------------------------------- state --
    def state_dict(self) -> dict[str, Any]:
        """Numpy-backed snapshot of every parameter (checkpointing parity
        with ``nn.Module.state_dict``; see utils/checkpoint.py for orbax)."""
        import numpy as np

        return {k: np.asarray(v) for k, v in self._params.items()}

    def load_state_dict(self, state: Mapping[str, Any],
                        strict: bool = True) -> None:
        """Load a :meth:`state_dict`. ``strict=True`` (the torch
        ``nn.Module`` default this mirrors) raises on unexpected or
        missing keys instead of silently running with init-time weights."""
        if strict:
            # derived arrays (self._derived) are accepted-and-ignored:
            # snapshots written by versions that stored them as parameters
            # still load, but they are always recomputed from the real
            # state below, never trusted from the file
            unexpected = sorted(set(state) - set(self._params)
                                - set(self._derived))
            missing = sorted(set(self._params) - set(state))
            if unexpected or missing:
                raise KeyError(
                    f"load_state_dict (strict): missing keys {missing}, "
                    f"unexpected keys {unexpected}"
                )
        loaded = set()
        for k, v in state.items():
            if k in self._params:
                self._params[k] = jnp.asarray(v)
                loaded.add(k)
        self._refresh_derived(loaded)

    def _verbose_print(self, verbose: bool, message: str) -> None:
        if verbose:
            print(message)
