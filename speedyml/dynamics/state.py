"""Prognostic spectral state as a JAX pytree.

Replaces the reference's global module arrays (src/mod_dynvar.f90) with an
immutable pytree threaded through pure step functions.

Layouts: spectral arrays are complex (..., kx, mx, nx); the two leapfrog time
levels are a leading axis of size 2 (level 0 = "current", level 1 = "new",
matching the reference's F(1)/F(2)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SpectralState(NamedTuple):
    """Leapfrog prognostic state (mod_dynvar.f90:9-33).

    Spectral arrays are REAL with an (re, im) axis: (..., mx, 2, nx)."""

    vor: jax.Array   # (2, kx, mx, 2, nx) vorticity
    div: jax.Array   # (2, kx, mx, 2, nx) divergence
    t: jax.Array     # (2, kx, mx, 2, nx) absolute temperature
    ps: jax.Array    # (2, mx, 2, nx)     log(p_s / p0)
    tr: jax.Array    # (2, ntr, kx, mx, 2, nx) tracers (tracer 0: q, g/kg)

    def at_level(self, j: int) -> "PrognosticFields":
        return PrognosticFields(self.vor[j], self.div[j], self.t[j],
                                self.ps[j], self.tr[j])


class PrognosticFields(NamedTuple):
    """One time level of the prognostic state."""

    vor: jax.Array   # (kx, mx, 2, nx)
    div: jax.Array
    t: jax.Array
    ps: jax.Array    # (mx, 2, nx)
    tr: jax.Array    # (ntr, kx, mx, 2, nx)


class Tendencies(NamedTuple):
    vordt: jax.Array
    divdt: jax.Array
    tdt: jax.Array
    psdt: jax.Array
    trdt: jax.Array


def zero_state(kx: int, mx: int, nx: int, ntr: int, dtype) -> SpectralState:
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    return SpectralState(
        vor=z(2, kx, mx, 2, nx),
        div=z(2, kx, mx, 2, nx),
        t=z(2, kx, mx, 2, nx),
        ps=z(2, mx, 2, nx),
        tr=z(2, ntr, kx, mx, 2, nx),
    )
