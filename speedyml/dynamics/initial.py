"""Initial conditions: reference atmosphere at rest.

Replicates the istart=0 path of the reference (src/ini_invars.f90:36-112):
isothermal 216 K stratosphere over a constant-lapse-rate troposphere in
hydrostatic balance with the (truncated) orography, at rest, with reference
humidity decaying with height.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.constants import PHYS, DYN
from .state import SpectralState


def rest_state(dy) -> SpectralState:
    cfg = dy.config
    kx, mx, nx, ntr = cfg.kx, cfg.mx, cfg.nx, cfg.ntr
    cdtype = dy.cdtype

    gam1 = DYN.gamma / (1000.0 * PHYS.grav)
    tref, ttop = 288.0, 216.0
    gam2 = gam1 / tref
    rgam = PHYS.rgas * gam1
    rgamr = 1.0 / rgam
    ccon = np.sqrt(2.0)     # mean-value coefficient: c00 = sqrt(2) * mean

    fsg = np.asarray(dy.vg.fsg)

    t = jnp.zeros((kx, mx, nx), dtype=cdtype)
    t = t.at[0, 0, 0].set(ccon * ttop)
    t = t.at[1, 0, 0].set(ccon * ttop)
    surfs = -gam1 * dy.phis
    surfs = surfs.at[0, 0].set(ccon * tref - gam1 * dy.phis[0, 0])
    for k in range(2, kx):
        t = t.at[k].set(surfs * float(fsg[k] ** rgam))

    # log-ps consistent with the temperature profile (p_ref = 1013 hPa at z=0)
    rlog0 = np.log(1.013)
    phis0 = dy.phis0_grid
    surfg = rlog0 + rgamr * jnp.log(1.0 - gam2 * phis0)
    ps = dy.T.trunct(dy.T.grid_to_spec(surfg)).astype(cdtype)

    # tropospheric specific humidity in g/kg
    esref = 17.0
    qref = DYN.refrh1 * 0.622 * esref
    qexp = DYN.hscale / DYN.hshum
    surfg_q = qref * jnp.exp(qexp * surfg)
    surfs_q = dy.T.trunct(dy.T.grid_to_spec(surfg_q)).astype(cdtype)
    tr = jnp.zeros((ntr, kx, mx, nx), dtype=cdtype)
    for k in range(2, kx):
        tr = tr.at[0, k].set(surfs_q * float(fsg[k] ** qexp))

    zeros = jnp.zeros((kx, mx, nx), dtype=cdtype)
    stack2 = lambda x: jnp.stack([x, x], axis=0)
    return SpectralState(vor=stack2(zeros), div=stack2(zeros), t=stack2(t),
                         ps=stack2(ps), tr=stack2(tr))
