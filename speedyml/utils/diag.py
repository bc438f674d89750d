"""Diagnostics & observability.

The reference's only observability is wall-of-print logging with sentinel
regions and an RMS printout (ppo_diagns.f90:1; SURVEY.md section 5.1/5.5).
Here: structured RMS diagnostics over the spectral state, jax.profiler named
scopes for the hot phases, and a NaN guard usable inside jitted code.
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("speedyml")


def spectral_rms(state, vg_dhs=None) -> dict:
    """Global RMS of each prognostic field from spectral coefficients
    (diagns, ppo_diagns.f90: sum of |coeff|^2 with m>0 doubled).

    state: SpectralState or PrognosticFields-like with (kx, mx, 2, nx)
    arrays (pass one time level). Returns python floats.
    """
    def rms(spec):
        # real-pair layout (..., mx, 2, nx): m=0 counted once, m>0 twice
        w = jnp.ones(spec.shape[-3]).at[0].set(0.5) * 2.0
        s2 = jnp.sum(spec * spec, axis=-2)          # re^2+im^2: (..., mx, nx)
        tot = jnp.sum(s2 * w[:, None], axis=(-2, -1))
        return jnp.sqrt(jnp.mean(tot))

    out = {}
    for name in ("vor", "div", "t", "ps"):
        out[name] = float(rms(getattr(state, name)))
    if hasattr(state, "tr"):
        out["q"] = float(rms(state.tr[0] if state.tr.ndim > 4 else state.tr))
    return out


def check_finite(tree, where: str = "") -> bool:
    """Host-side NaN/Inf sweep over a pytree; logs offenders."""
    ok = True
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            log.error("non-finite values at %s%s (%d bad of %d)",
                      where, jax.tree_util.keystr(path),
                      int((~np.isfinite(a)).sum()), a.size)
            ok = False
    return ok


def nan_guard(x, label: str):
    """In-jit NaN check: replaces NaN with 0 and flags via jax.debug.print
    (the jit-compatible analog of the reference's IEEE_IS_NAN sentinels,
    mod_reservoir.f90:1302-1305)."""
    bad = jnp.sum(~jnp.isfinite(x))
    jax.lax.cond(
        bad > 0,
        lambda: jax.debug.print("NaN guard [{}]: {} non-finite", label, bad),
        lambda: None)
    return jnp.where(jnp.isfinite(x), x, 0.0)


@contextlib.contextmanager
def phase(name: str, log_time: bool = False):
    """Named profiler scope + optional wall-time logging. Shows up in
    jax.profiler traces (TensorBoard) under the given name."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if log_time:
        log.info("%s: %.3fs", name, time.perf_counter() - t0)


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
