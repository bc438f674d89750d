"""Horizontal diffusion damping coefficients.

Replicates the del^8 / del^2 damping setup of the reference
(src/ini_indyns.f90:94-112) and the implicit damping factors recomputed per
dt (src/ini_impint.f90:34-41).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..core.constants import DYN


@dataclasses.dataclass(frozen=True)
class DiffusionTables:
    dmp: np.ndarray    # (mx, nx) del^8 damping for vor, T
    dmpd: np.ndarray   # (mx, nx) del^8 damping for div
    dmps: np.ndarray   # (mx, nx) del^2 stratospheric damping


def build_diffusion(ntrun: int, mx: int, nx: int) -> DiffusionTables:
    hdiff = 1.0 / (DYN.thd * 3600.0)
    hdifd = 1.0 / (DYN.thdd * 3600.0)
    hdifs = 1.0 / (DYN.thds * 3600.0)
    rlap = 1.0 / (ntrun * (ntrun + 1))

    twn = (np.arange(mx)[:, None] + np.arange(nx)[None, :]).astype(np.float64)
    elap = twn * (twn + 1.0) * rlap
    elapn = elap ** DYN.npowhd
    return DiffusionTables(dmp=hdiff * elapn, dmpd=hdifd * elapn,
                           dmps=hdifs * elap)


class DiffusionCoefs:
    """Damping coefficients for one dt, host (numpy) constants."""

    def __init__(self, tables: DiffusionTables, dt: float, dtype=jnp.float32):
        np_dtype = np.float64 if dtype == jnp.float64 else np.float32
        # broadcast shape (mx, 1, nx) over the (re, im) spectral axis
        as_r = lambda x: np.asarray(x, dtype=np_dtype)[:, None, :]
        self.dmp = as_r(tables.dmp)
        self.dmpd = as_r(tables.dmpd)
        self.dmps = as_r(tables.dmps)
        self.dmp1 = as_r(1.0 / (1.0 + tables.dmp * dt))
        self.dmp1d = as_r(1.0 / (1.0 + tables.dmpd * dt))
        self.dmp1s = as_r(1.0 / (1.0 + tables.dmps * dt))


def hordif(field, fdt, dmp, dmp1):
    """fdt <- (fdt - dmp*field) * dmp1 (dyn_step.f90:130-151); coefficients
    are (mx, 1, nx), broadcasting over level axes and the (re, im) axis."""
    return (fdt - dmp * field) * dmp1
