"""Simplified mass-flux deep convection (reference: src/phy_convmf.f90).

The reference's per-column control flow (top detection, descending
entrainment loop) is re-expressed as fully-vectorized masked updates over the
whole (il, ix) grid with a short static descent over levels, so the scheme
fuses into the surrounding XLA program with no gather/scatter.

All level arrays are (kx, il, ix); 0-based level 0 = top, kx-1 = PBL.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import PP, SigmaTables


def convmf(st: SigmaTables, psa, se, qa, qsat):
    """Returns (itop, cbmf, precnv, dfse, dfqa).

    itop: (il, ix) int32, 0-based top level of convection; kx = no convection.
    dfse/dfqa: net fluxes into each layer (to be converted to tendencies by
    the caller via rps*grdscp/grdsig as in phy_phypar.f90:100-105).
    """
    kx = se.shape[0]
    nl1 = kx - 2                      # 0-based index of layer above PBL
    dtype = se.dtype

    sig = jnp.asarray(st.sig, dtype)
    dsig = jnp.asarray(st.dsig, dtype)
    wvi = jnp.asarray(st.wvi, dtype)

    fqmax = 5.0
    fm0 = PP.p0 * st.dsig[kx - 1] / (PP.gg * PP.trcnv * 3600.0)
    rdps = 2.0 / (1.0 - PP.psmin)
    alhc = PP.alhc

    # saturation moist static energy (levels >= 1 used)
    mss = se + alhc * qsat

    # entrainment profile over 0-based levels 1..kx-2 (phy_convmf.f90:80-88)
    entr_np = np.maximum(0.0, st.sig[1 : kx - 1] - 0.5) ** 2
    entr_np = PP.entmax * entr_np / entr_np.sum()
    entr = np.zeros(kx)
    entr[1 : kx - 1] = entr_np
    entr = jnp.asarray(entr, dtype)

    # ---- 2. conditions for convection (phy_convmf.f90:90-140) ----
    mse0 = se[kx - 1] + alhc * qa[kx - 1]
    mse1 = jnp.minimum(mse0, se[nl1] + alhc * qa[nl1])
    mss0 = jnp.maximum(mse0, mss[kx - 1])

    big = jnp.asarray(kx - 1, jnp.int32)
    ktop1 = jnp.full(psa.shape, kx - 1, jnp.int32)
    ktop2 = jnp.full(psa.shape, kx - 1, jnp.int32)
    msthr = jnp.zeros_like(mse0)
    # 0-based k from kx-4 down to 2 (reference k=nlev-3..3 descending)
    for k in range(kx - 4, 1, -1):
        mss2 = mss[k] + wvi[k, 1] * (mss[k + 1] - mss[k])
        ktop1 = jnp.where(mss0 > mss2, k, ktop1)
        hit2 = mse1 > mss2
        ktop2 = jnp.where(hit2, k, ktop2)
        msthr = jnp.where(hit2, mss2, msthr)

    qthr0 = PP.rhbl * qsat[kx - 1]
    qthr1 = PP.rhbl * qsat[nl1]
    lqthr = (qa[kx - 1] > qthr0) & (qa[nl1] > qthr1)

    cond_base = (psa > PP.psmin) & (ktop1 < kx - 1)
    case1 = ktop2 < kx - 1
    active = cond_base & (case1 | lqthr)
    itop = jnp.where(active, ktop1, kx).astype(jnp.int32)
    qdif = jnp.where(case1,
                     jnp.maximum(qa[kx - 1] - qthr0, (mse0 - msthr) / alhc),
                     qa[kx - 1] - qthr0)

    # ---- 3. convection fluxes (phy_convmf.f90:142-237) ----
    zero = jnp.zeros_like(psa)
    dfse = [zero] * kx
    dfqa = [zero] * kx

    # 3.1 boundary layer (cloud base)
    k, k1 = kx - 1, kx - 2
    qmax = jnp.maximum(1.01 * qa[k], qsat[k])
    sb = se[k1] + wvi[k1, 1] * (se[k] - se[k1])
    qb = jnp.minimum(qa[k1] + wvi[k1, 1] * (qa[k] - qa[k1]), qa[k])
    fpsa = psa * jnp.minimum(1.0, (psa - PP.psmin) * rdps)
    fmass = jnp.where(active,
                      fm0 * fpsa * jnp.minimum(fqmax, qdif / (qmax - qb)),
                      0.0)
    cbmf = fmass
    fus = fmass * se[k]
    fuq = fmass * qmax
    fds = fmass * sb
    fdq = fmass * qb
    dfse[k] = fds - fus
    dfqa[k] = fdq - fuq

    # 3.2 intermediate layers (entrainment) + 3.3 top layer, masked descent
    precnv = zero
    dfqa_pbl_extra = zero
    for k in range(kx - 2, 1, -1):
        k1 = k - 1
        inter = active & (k > itop)
        top = active & (k == itop)

        # --- top layer: condensation + detrainment (uses carry as-is) ---
        qsatb = qsat[k] + wvi[k, 1] * (qsat[k + 1] - qsat[k])
        prec_k = jnp.maximum(fuq - fmass * qsatb, 0.0)
        dfse[k] = jnp.where(top, fus - fds + alhc * prec_k, dfse[k])
        dfqa[k] = jnp.where(top, fuq - fdq - prec_k, dfqa[k])
        precnv = precnv + jnp.where(top, prec_k, 0.0)

        # --- intermediate layer ---
        lower = fus - fds
        lower_q = fuq - fdq
        enmass = entr[k] * psa * cbmf
        fmass_n = fmass + enmass
        fus_n = fus + enmass * se[k]
        fuq_n = fuq + enmass * qa[k]
        sb = se[k1] + wvi[k1, 1] * (se[k] - se[k1])
        qb = qa[k1] + wvi[k1, 1] * (qa[k] - qa[k1])
        fds_n = fmass_n * sb
        fdq_n = fmass_n * qb

        delq = PP.rhil * qsat[k] - qa[k]
        fsq = jnp.where(inter & (delq > 0.0), PP.smf * cbmf * delq, 0.0)

        dfse[k] = jnp.where(inter, lower + fds_n - fus_n, dfse[k])
        dfqa[k] = jnp.where(inter, lower_q + fdq_n - fuq_n + fsq, dfqa[k])
        dfqa_pbl_extra = dfqa_pbl_extra - fsq

        fmass = jnp.where(inter, fmass_n, fmass)
        fus = jnp.where(inter, fus_n, fus)
        fuq = jnp.where(inter, fuq_n, fuq)
        fds = jnp.where(inter, fds_n, fds)
        fdq = jnp.where(inter, fdq_n, fdq)

    dfqa[kx - 1] = dfqa[kx - 1] + dfqa_pbl_extra
    dfse_a = jnp.stack(dfse, axis=0) * active[None]
    dfqa_a = jnp.stack(dfqa, axis=0) * active[None]
    return itop, cbmf, precnv * active, dfse_a, dfqa_a
