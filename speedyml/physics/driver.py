"""Physics parametrization driver (reference: src/phy_phypar.f90).

`step_physics` is the grid-space physics increment used by the dynamical
core's grtend hook: it consumes the j1-time-level prognostic fields, the
daily surface/solar state and the persistent radiation carry, and returns
tendency increments plus the updated carry and the fluxes the coupler needs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import PP, SigmaTables
from .humidity import rel_hum
from .convection import convmf
from .condensation import lscond
from .radiation import SolarFields, cloud, radsw, radlw_down, radlw_up
from .surface import suflux
from .vdiff import vdifsc


class SurfaceDailyState(NamedTuple):
    """Daily-updated surface fields (coupler + fordate outputs), all (il, ix)
    except the zonal solar fields (il,)."""

    stl_am: jnp.ndarray     # land surface temperature
    snowd_am: jnp.ndarray   # snow depth
    soilw_am: jnp.ndarray   # soil water availability
    sst_am: jnp.ndarray     # SST (incl. ice blending)
    sice_am: jnp.ndarray    # sea-ice fraction
    tice_am: jnp.ndarray    # sea-ice temperature
    alb_l: jnp.ndarray
    alb_s: jnp.ndarray
    albsfc: jnp.ndarray
    snowc: jnp.ndarray
    fsol: jnp.ndarray       # (il,)
    ozupp: jnp.ndarray
    ozone: jnp.ndarray
    zenit: jnp.ndarray
    stratz: jnp.ndarray


class RadCarry(NamedTuple):
    """State persisting between shortwave steps (nstrad cadence)."""

    tau2_lw: jnp.ndarray   # (4, kx, il, ix)
    stratc: jnp.ndarray    # (2, il, ix)
    tt_rsw: jnp.ndarray    # (kx, il, ix) SW heating [K/s]
    ssrd: jnp.ndarray      # (il, ix)
    ssr: jnp.ndarray
    tsr: jnp.ndarray


class StepFluxes(NamedTuple):
    """Per-step fluxes needed by the coupler daily means and output."""

    precnv: jnp.ndarray
    precls: jnp.ndarray
    evap: jnp.ndarray       # land/sea-weighted evaporation [g/(m^2 s)]
    evap_l: jnp.ndarray
    evap_s: jnp.ndarray
    hfluxn_l: jnp.ndarray
    hfluxn_s: jnp.ndarray
    shf_s: jnp.ndarray
    ssrd: jnp.ndarray
    ustr_s: jnp.ndarray
    vstr_s: jnp.ndarray
    ssr: jnp.ndarray
    slr_s: jnp.ndarray
    olr: jnp.ndarray
    tsr: jnp.ndarray


def init_rad_carry(kx: int, il: int, ix: int, dtype) -> RadCarry:
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    return RadCarry(tau2_lw=jnp.ones((4, kx, il, ix), dtype=dtype),
                    stratc=z(2, il, ix), tt_rsw=z(kx, il, ix),
                    ssrd=z(il, ix), ssr=z(il, ix), tsr=z(il, ix))


class Physics:
    """Holds static physics tables; exposes the per-step function."""

    def __init__(self, st: SigmaTables, clat, forog, fmask1, phis0_grid,
                 dtype=None):
        if dtype is not None:
            # pin the sigma tables to the compute dtype: they are f64 numpy
            # (host precision) and would otherwise enter the jitted physics
            # as f64 constants when the process runs with x64 enabled
            import dataclasses as _dc
            st = _dc.replace(st, **{
                f.name: np.asarray(getattr(st, f.name), dtype)
                for f in _dc.fields(st)})
        self.st = st
        self.clat = clat          # (il,) jnp
        self.forog = forog        # (il, ix) jnp
        self.fmask1 = fmask1      # (il, ix) jnp model land fraction
        self.phis0 = phis0_grid   # (il, ix) jnp surface geopotential

    def step_physics(self, dy, f, surf: SurfaceDailyState, rad: RadCarry,
                     lradsw, randfh=None):
        """Returns ((du, dv, dtt, dqt) grid increments, new RadCarry,
        StepFluxes). lradsw may be a traced bool (lax.cond inside).

        `randfh` (2, il, ix), if given, enables random diabatic forcing
        (phy_phypar.f90:202-216): the fixed pattern pair times zonal-mean
        heating profiles is added to the temperature tendency. The profiles
        are refreshed every step here (the reference refreshes mode 1/2 only
        on shortwave steps; recomputing is cheaper than carrying them and
        only smooths the forcing)."""
        st = self.st
        T = dy.T
        kx = dy.config.kx
        nl1 = kx - 2

        # --- 1. grid-point fields at the physics time level (one batched
        # transform per cos-scaling group) ---
        from ..dynamics.implicit import geopotential
        ucosm, vcosm = T.uvspec(f.vor, f.div)
        g2 = T.spec_to_grid(jnp.concatenate([ucosm, vcosm]), kcos=2)
        ug, vg = g2[:kx], g2[kx:]
        phi = geopotential(f.t, dy.phis, dy.vg_jnp)
        g1 = T.spec_to_grid(jnp.concatenate(
            [f.t, f.tr[0], phi, f.ps[None]]))
        tg = g1[:kx]
        qg = jnp.maximum(g1[kx:2 * kx], 0.0)
        phig = g1[2 * kx:3 * kx]
        pslg = g1[3 * kx]

        psg = jnp.exp(pslg)
        rps = 1.0 / psg

        se = PP.cp * tg + phig
        sig = jnp.asarray(st.sig, tg.dtype)
        rh, qsat = rel_hum(qg, tg, sig[:, None, None] * psg[None])

        grdsig = jnp.asarray(st.grdsig, tg.dtype)[:, None, None]
        grdscp = jnp.asarray(st.grdscp, tg.dtype)[:, None, None]

        # --- 2. precipitation ---
        itop, cbmf, precnv, dfse, dfqa = convmf(st, psg, se, qg, qsat)
        tt_cnv = dfse * rps[None] * grdscp
        qt_cnv = dfqa * rps[None] * grdsig
        icnv = (kx - 1) - itop

        itop, precls, tt_lsc, qt_lsc = lscond(st, psg, qg, qsat, itop)

        ttend = tt_cnv + tt_lsc
        qtend = qt_cnv + qt_lsc

        # --- 3. radiation ---
        sol = SolarFields(fsol=surf.fsol, ozupp=surf.ozupp, ozone=surf.ozone,
                          zenit=surf.zenit, stratz=surf.stratz)

        def do_sw(_):
            gse = (se[nl1] - se[kx - 1]) / (phig[nl1] - phig[kx - 1])
            icltop, cloudc, clstr, _ = cloud(st, qg, rh, precnv, precls,
                                             itop, gse, self.fmask1)
            out = radsw(st, sol, psg, qg, icltop, cloudc, clstr, surf.albsfc)
            new = RadCarry(tau2_lw=out.tau2_lw, stratc=out.stratc,
                           tt_rsw=out.dfabs * rps[None] * grdscp,
                           ssrd=out.ssrd, ssr=out.ssr, tsr=out.tsr)
            # surface fields may arrive in a wider dtype (x64 test configs);
            # both cond branches must return the carry's dtypes exactly
            return jax.tree.map(lambda a, b: a.astype(b.dtype), new, rad)

        rad = jax.lax.cond(lradsw, do_sw, lambda _: rad, operand=None)

        slrd, dfabs_lw, flux_bands, st4a1, st4a2 = radlw_down(
            st, rad.tau2_lw, tg)

        # --- surface fluxes ---
        fx = suflux(st, self.clat, self.forog, psg, ug, vg, tg, qg, rh, phig,
                    self.phis0, self.fmask1, surf.stl_am, surf.sst_am,
                    surf.soilw_am, rad.ssrd, slrd, surf.alb_l, surf.alb_s,
                    surf.snowc)

        slr, olr, dfabs_lw = radlw_up(st, rad.tau2_lw, rad.stratc, tg,
                                      fx.tsfc, slrd, fx.slru, flux_bands,
                                      dfabs_lw, st4a1, st4a2)
        tt_rlw = dfabs_lw * rps[None] * grdscp
        ttend = ttend + rad.tt_rsw + tt_rlw

        # --- 4. PBL: vertical diffusion + surface flux tendencies ---
        ut_pbl, vt_pbl, tt_pbl, qt_pbl = vdifsc(st, ug, vg, se, rh, qg, qsat,
                                                phig, icnv)
        g_last = grdsig[kx - 1]
        gc_last = grdscp[kx - 1]
        ut_pbl = ut_pbl.at[kx - 1].add(fx.ustr * rps * g_last)
        vt_pbl = vt_pbl.at[kx - 1].add(fx.vstr * rps * g_last)
        tt_pbl = tt_pbl.at[kx - 1].add(fx.shf * rps * gc_last)
        qt_pbl = qt_pbl.at[kx - 1].add(fx.evap * rps * g_last)

        utend = ut_pbl
        vtend = vt_pbl
        ttend = ttend + tt_pbl
        qtend = qtend + qt_pbl

        # --- 5. random diabatic forcing (phy_phypar.f90:202-216) ---
        if randfh is not None:
            from .randfor import tt_rdf, xs_rdf
            randfv1 = xs_rdf(tt_lsc, tt_cnv, st.sig, 1)
            randfv2 = xs_rdf(rad.tt_rsw, tt_rlw, st.sig, 2)
            ttend = ttend + tt_rdf(randfh, randfv1, randfv2)

        fluxes = StepFluxes(precnv=precnv, precls=precls,
                            evap=fx.evap, evap_l=fx.evap_l, evap_s=fx.evap_s,
                            hfluxn_l=fx.hfluxn_l, hfluxn_s=fx.hfluxn_s,
                            shf_s=fx.shf_s, ssrd=rad.ssrd,
                            ustr_s=fx.ustr_s, vstr_s=fx.vstr_s,
                            ssr=rad.ssr, slr_s=slr, olr=olr, tsr=rad.tsr)
        return (utend, vtend, ttend, qtend[None]), rad, fluxes
