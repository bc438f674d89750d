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


# Physical std floor for the CLAMPED SST input section [K]. The training
# series clamps SST >= 272 K (the reference's unit fix), so fully ice-
# covered input patches are EXACTLY constant and their std collapses to
# the eps floor (measured 1e-8 over 125/1152 polar regions at reference
# scale). A coupled run then turns a +0.05 K fed-back anomaly at a
# marginal ice-edge point into a ~1e6-sigma standardized input, tanh
# saturates the region's reservoir, and the readout explodes — the r4
# step-28 coupled blow-up, identical in both loop implementations and
# independent of the anomaly's magnitude. Flooring at a deep-seasonal
# scale keeps such channels bounded (z <= anom/0.3) WITHOUT retraining:
# the frozen regions' mean is exactly 272, so training inputs were
# u = (272-272)/std = 0 under either std.
SST_STD_FLOOR = 0.3


def floor_sst_std(stz: Standardizer, layout) -> Standardizer:
    """Apply SST_STD_FLOOR to the SST input section of a Standardizer
    (idempotent; used on freshly computed stats and on weights loaded from
    files persisted before the floor existed)."""
    t0, t1 = layout.sizes["sst"]
    if t1 <= t0:
        return stz
    in_std = np.array(stz.in_std)
    in_std[:, t0:t1] = np.maximum(in_std[:, t0:t1], SST_STD_FLOOR)
    return stz._replace(in_std=jnp.asarray(in_std, stz.in_std.dtype))


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
            if name == "sst":
                sd2 = np.maximum(sd2, SST_STD_FLOOR)
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


def compute_stats_gv(layout: RegionLayout, gv: np.ndarray,
                     chunk: int = 1024, eps: float = 1e-8) -> Standardizer:
    """compute_stats streamed from the PACKED series (T, gv_len).

    At reference scale x 16k samples, materializing the gathered input
    series (T, R, n_in) costs 43 GB plus ~2x that in numpy mean/std
    temporaries — minutes of 2-core host time and most of the RAM. This
    version gathers (chunk, R, n_in) slices and accumulates first/second
    moments in f64; same per-(region, var, level) stats to float rounding
    (biased std, matching np.std ddof=0).
    """
    L = layout
    T = gv.shape[0]
    idx = np.asarray(L.input_index)
    R, n_in = idx.shape
    npatch = L.inpy * L.inpx
    s0, s1 = L.sizes["atmo3d"]
    sec2d = [(name,) + L.sizes[name]
             for name in ("logp", "precip", "sst", "tisr", "ohtc")
             if L.sizes[name][1] > L.sizes[name][0]]

    m1_a = np.zeros((R, L.inpz, L.nvars))
    m2_a = np.zeros((R, L.inpz, L.nvars))
    m1_2d = {name: np.zeros(R) for name, _, _ in sec2d}
    m2_2d = {name: np.zeros(R) for name, _, _ in sec2d}
    for t0 in range(0, T, chunk):
        blk = gv[t0:t0 + chunk][:, idx]               # (c, R, n_in)
        c = blk.shape[0]
        atmo = blk[:, :, s0:s1].reshape(c, R, L.inpz, npatch, L.nvars)
        m1_a += atmo.sum(axis=(0, 3), dtype=np.float64)
        m2_a += np.square(atmo, dtype=np.float64).sum(axis=(0, 3))
        for name, t0s, t1s in sec2d:
            sec = blk[:, :, t0s:t1s]
            m1_2d[name] += sec.sum(axis=(0, 2), dtype=np.float64)
            m2_2d[name] += np.square(sec, dtype=np.float64).sum(axis=(0, 2))

    n_a = T * npatch
    m = m1_a / n_a
    sd = np.sqrt(np.maximum(m2_a / n_a - m * m, 0.0)) + eps

    in_mean = np.empty((R, n_in))
    in_std = np.empty((R, n_in))
    in_mean[:, s0:s1] = np.repeat(m[:, :, None, :], npatch, axis=2
                                  ).reshape(R, -1)
    in_std[:, s0:s1] = np.repeat(sd[:, :, None, :], npatch, axis=2
                                 ).reshape(R, -1)
    for name, t0s, t1s in sec2d:
        n2 = T * (t1s - t0s)
        m2 = m1_2d[name] / n2
        sd2 = np.sqrt(np.maximum(m2_2d[name] / n2 - m2 * m2, 0.0)) + eps
        if name == "sst":
            sd2 = np.maximum(sd2, SST_STD_FLOOR)
        in_mean[:, t0s:t1s] = m2[:, None]
        in_std[:, t0s:t1s] = sd2[:, None]

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
            t0s, _ = L.sizes[name]
            u0, u1 = L.out_sizes[name]
            out_mean[:, u0:u1] = in_mean[:, t0s:t0s + 1]
            out_std[:, u0:u1] = in_std[:, t0s:t0s + 1]

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
