"""Per-region standardization of packed input/output vectors.

The reference standardizes each variable per region with a scalar mean/std
per (variable, level) plus special handling of 2-D fields
(mod_utilities.f90:640-1343; res_domain.f90:1211-1563). Here the stats are
expanded once into full per-element (R, n_in)/(R, n_out) vectors so
application is a fused multiply-add on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .decomposition import RegionLayout


class Standardizer(NamedTuple):
    in_mean: jnp.ndarray    # (R, n_in)
    in_std: jnp.ndarray     # (R, n_in)
    out_mean: jnp.ndarray   # (R, n_out)
    out_std: jnp.ndarray    # (R, n_out)


def compute_stats(layout: RegionLayout, inputs: np.ndarray,
                  eps: float = 1e-8) -> Standardizer:
    """Compute per-(region, var, level) stats from a packed input series
    (T, R, n_in) and expand to per-element vectors.

    Stats are shared across the spatial patch within a region (matching the
    reference's per-var-per-level scalars, mod_utilities.f90:934-1040) by
    averaging over patch positions.
    """
    L = layout
    T, R, n_in = inputs.shape
    in_mean = np.empty((R, n_in))
    in_std = np.empty((R, n_in))

    npatch = L.inpy * L.inpx
    s0, s1 = L.sizes["atmo3d"]
    atmo = inputs[:, :, s0:s1].reshape(T, R, L.inpz, npatch, L.nvars)
    m = atmo.mean(axis=(0, 3))                        # (R, inpz, nvars)
    sd = atmo.std(axis=(0, 3)) + eps
    in_mean[:, s0:s1] = np.repeat(m[:, :, None, :], npatch, axis=2
                                  ).reshape(R, -1)
    in_std[:, s0:s1] = np.repeat(sd[:, :, None, :], npatch, axis=2
                                 ).reshape(R, -1)

    for name in ("logp", "precip", "sst", "tisr", "ohtc"):
        t0, t1 = L.sizes[name]
        if t1 > t0:
            sec = inputs[:, :, t0:t1]
            m2 = sec.mean(axis=(0, 2))
            sd2 = sec.std(axis=(0, 2)) + eps
            in_mean[:, t0:t1] = m2[:, None]
            in_std[:, t0:t1] = sd2[:, None]

    # output stats = the same stats restricted to the core sections
    # (core level zz sits at input slab position zz + vert_overlap)
    out_mean = np.empty((R, L.n_out))
    out_std = np.empty((R, L.n_out))
    o0, o1 = L.out_sizes["atmo3d"]
    ncore = L.resy * L.resx
    mc = m[:, L.vert_overlap:L.vert_overlap + L.kz_core, :]
    sdc = sd[:, L.vert_overlap:L.vert_overlap + L.kz_core, :]
    out_mean[:, o0:o1] = np.repeat(mc[:, :, None, :], ncore, axis=2
                                   ).reshape(R, -1)
    out_std[:, o0:o1] = np.repeat(sdc[:, :, None, :], ncore, axis=2
                                  ).reshape(R, -1)
    for name in ("logp", "precip"):
        if name in L.out_sizes:
            t0, t1 = L.sizes[name]
            u0, u1 = L.out_sizes[name]
            out_mean[:, u0:u1] = in_mean[:, t0:t0 + 1]
            out_std[:, u0:u1] = in_std[:, t0:t0 + 1]

    return Standardizer(in_mean=jnp.asarray(in_mean, jnp.float32),
                        in_std=jnp.asarray(in_std, jnp.float32),
                        out_mean=jnp.asarray(out_mean, jnp.float32),
                        out_std=jnp.asarray(out_std, jnp.float32))


def standardize_in(stz: Standardizer, u):
    return (u - stz.in_mean) / stz.in_std


def standardize_out(stz: Standardizer, y):
    return (y - stz.out_mean) / stz.out_std


def unstandardize_out(stz: Standardizer, y):
    return y * stz.out_std + stz.out_mean
