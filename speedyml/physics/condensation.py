"""Large-scale condensation (reference: src/phy_lscond.f90)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import PP, SigmaTables


def lscond(st: SigmaTables, psa, qa, qsat, itop):
    """Returns (itop, precls, dtlsc, dqlsc).

    dqlsc in [g/kg / s]; dtlsc in [K/s]; precls in [g/(m^2 s)].
    """
    kx = qa.shape[0]
    dtype = qa.dtype

    qsmax = 10.0
    rtlsc = 1.0 / (PP.trlsc * 3600.0)
    tfact = PP.alhc / PP.cp
    prg = PP.p0 / PP.gg

    psa2 = psa * psa

    sig2 = jnp.asarray(st.sig**2, dtype)[:, None, None]
    rhref = PP.rhlsc + PP.drhlsc * (sig2 - 1.0)
    rhref = rhref.at[kx - 1].set(jnp.maximum(rhref[kx - 1], PP.rhblsc))
    dqmax = qsmax * sig2 * rtlsc

    dqa = rhref * qsat - qa                       # (kx, il, ix)
    cond = dqa < 0.0
    dqlsc = jnp.where(cond, dqa * rtlsc, 0.0)
    dtlsc = jnp.where(cond,
                      tfact * jnp.minimum(-dqlsc, dqmax * psa2[None]), 0.0)
    # level 0 (top) excluded (loop k=2..nlev in the reference)
    dqlsc = dqlsc.at[0].set(0.0)
    dtlsc = dtlsc.at[0].set(0.0)
    cond = cond.at[0].set(False)

    # update cloud-top: lowest-index condensing level
    lev = jnp.arange(kx, dtype=jnp.int32)[:, None, None]
    cond_top = jnp.min(jnp.where(cond, lev, kx), axis=0).astype(jnp.int32)
    itop_new = jnp.minimum(itop, cond_top)

    pfact = jnp.asarray(st.dsig * prg, dtype)[:, None, None]
    precls = -jnp.sum(pfact * dqlsc, axis=0) * psa
    return itop_new, precls, dtlsc, dqlsc
