"""Golden-oracle tests for the semi-implicit gravity-wave scheme.

These validate the implementation against the *defining mathematics* of the
scheme rather than against its own tables (no compiled Fortran is available
in this image, so the oracles are closed-form identities):

1. `implicit_correction` output must satisfy the backward-implicit system it
   is the closed-form solution of (reference dyn_implic.f90:27-67 solves
   xf @ D' = yf with xf from ini_impint.f90:129-141):

       D' = D + dt*alph * (l(l+1)/a^2) * (XD @ T' + R*tref * ps')
       T'  = T  + dt*alph * XC @ D'
       ps' = ps - dt*alph * dhs . D'

   i.e. the corrected divergence tendency equals the explicit one plus the
   gravity-wave terms evaluated at the *corrected* T/ps tendencies. This
   holds independently of how the per-wavenumber inverses were built.

2. Hydrostatic `geopotential` for an isothermal atmosphere telescopes to the
   exact closed form phi_k - phis = -R*T0*ln(sigma_k) (dyn_geop.f90:19-32
   with constant T; the zonal lapse-rate correction vanishes).

3. The del^8 horizontal-diffusion damping follows the documented law
   dmp(n) = [n(n+1)/(N(N+1))]^4 / (thd*3600) and `hordif` applies the
   implicit-damping update (fdt - dmp*f)/(1 + dmp*dt)
   (ini_indyns.f90:94-112, dyn_step.f90:130-151).

4. The semi-implicit reference temperature profile is the closed form
   tref = 288 * max(0.2, sigma)^(R*gamma/(1000*g)) (ini_impint.f90:43-49).
"""

import numpy as np
import pytest

from speedyml.core.config import ModelConfig
from speedyml.core.constants import PHYS, DYN
from speedyml.core.vertical import make_vertical_grid
from speedyml.dynamics.hdiff import build_diffusion, DiffusionCoefs, hordif
from speedyml.dynamics.implicit import (ImplicitCoefs, build_implicit,
                                        geopotential, implicit_correction)

CFG = ModelConfig(dtype="float64")


@pytest.fixture(scope="module")
def vg():
    return make_vertical_grid(CFG.kx)


@pytest.fixture(scope="module")
def imp(vg):
    tables = build_implicit(vg, CFG.delt2, CFG.alph, CFG.mx, CFG.nx)
    import jax.numpy as jnp
    return ImplicitCoefs(tables, dtype=jnp.float64)


class TestImplicitSystem:
    def test_correction_satisfies_backward_system(self, imp, vg):
        """The output of implicit_correction is the exact solution of the
        coupled backward-implicit equations written only in terms of the
        scheme's physical definition (not its precomputed inverses)."""
        rng = np.random.default_rng(7)
        kx, mx, nx = CFG.kx, CFG.mx, CFG.nx
        divdt = rng.standard_normal((kx, mx, 2, nx))
        tdt = rng.standard_normal((kx, mx, 2, nx))
        psdt = rng.standard_normal((mx, 2, nx))

        nd, nt, nps = implicit_correction(imp, divdt, tdt, psdt)
        nd, nt, nps = map(np.asarray, (nd, nt, nps))

        xi = CFG.delt2 * CFG.alph
        ll = (np.arange(mx)[:, None] + np.arange(nx)[None, :]).astype(float)
        ell = ll * (ll + 1.0) * xi / PHYS.rearth ** 2   # (mx, nx)

        # gravity-wave forcing evaluated at the CORRECTED tendencies
        ye = (np.einsum("kl,lmcn->kmcn", np.asarray(imp.xd), nt)
              + PHYS.rgas * np.asarray(imp.tref)[:, None, None, None]
              * nps[None])
        rhs = divdt + ell[None, :, None, :] * ye

        # l = 0 modes carry no gravity-wave correction: output is zeroed
        # there by the xj gather (build_implicit:100)
        mask = (ll > 0)[None, :, None, :]
        np.testing.assert_allclose(np.where(mask, nd, 0.0),
                                   np.where(mask, rhs, 0.0),
                                   rtol=1e-10, atol=1e-10)

        # T' and ps' are the forward updates driven by D'
        np.testing.assert_allclose(
            nt, tdt + np.einsum("kl,lmcn->kmcn", np.asarray(imp.xc), nd),
            rtol=1e-12)
        np.testing.assert_allclose(
            nps, psdt - np.einsum("kmcn,k->mcn", nd, xi * vg.dhs),
            rtol=1e-12)

    def test_tref_closed_form(self, imp, vg):
        rgam = PHYS.rgas * DYN.gamma / (1000.0 * PHYS.grav)
        expect = 288.0 * np.maximum(0.2, vg.fsg) ** rgam
        np.testing.assert_allclose(np.asarray(imp.tref), expect, rtol=1e-12)

    def test_inverse_tables_invert_their_system(self, vg):
        """xj_mn must be the exact inverse of xf(l) = I + xi^2 l(l+1)/a^2 *
        (R tref (x) dhs - XD@XC) — rebuilt here from the stored unscaled
        pieces (xc is stored pre-scaled by xi)."""
        t = build_implicit(vg, CFG.delt2, CFG.alph, CFG.mx, CFG.nx)
        xi = CFG.delt2 * CFG.alph
        xe = t.xd @ (t.xc / xi)
        kx = vg.kx
        for l in (1, 5, 30, CFG.mx + CFG.nx - 2):
            xxx = l * (l + 1) / PHYS.rearth ** 2
            xf = (xi * xi * xxx
                  * (PHYS.rgas * np.outer(t.tref, vg.dhs) - xe) + np.eye(kx))
            # any (m, n) with m + n == l shares the same inverse
            m = min(l, CFG.mx - 1)
            np.testing.assert_allclose(xf @ t.xj_mn[m, l - m], np.eye(kx),
                                       atol=1e-9)


class TestGeopotential:
    def test_isothermal_closed_form(self, vg):
        """phi_k - phis = -R*T0*ln(sigma_k) exactly for constant T (the
        telescoping sum of xgeop1/xgeop2; lapse correction cancels)."""
        kx, mx, nx = CFG.kx, CFG.mx, CFG.nx
        T0 = 271.3
        t_spec = np.zeros((kx, mx, 2, nx))
        # grid value T0 everywhere <=> only the (m=0, n=0) coefficient set;
        # the transform normalization makes grid value == coefficient for
        # the constant mode, but here we only need linearity: feed the
        # constant directly in every spectral slot of a single-mode field.
        t_spec[:, 0, 0, 0] = T0
        phis = np.zeros((mx, 2, nx))
        phis[0, 0, 0] = 12345.0

        vgj = {k: np.asarray(getattr(vg, k), np.float64)
               for k in ("xgeop1", "xgeop2", "hsg", "fsg")}
        phi = np.array(geopotential(t_spec, phis, vgj))

        expect = phis[0, 0, 0] - PHYS.rgas * T0 * np.log(vg.fsg)
        np.testing.assert_allclose(phi[:, 0, 0, 0], expect, rtol=1e-12)
        # all other modes stay exactly zero
        phi[:, 0, 0, 0] = 0.0
        assert np.abs(phi).max() == 0.0


class TestDiffusionLaw:
    def test_del8_damping_analytic(self):
        d = build_diffusion(CFG.ntrun, CFG.mx, CFG.nx)
        n = 17
        expect = ((n * (n + 1)) / (CFG.ntrun * (CFG.ntrun + 1))) ** 4 \
            / (DYN.thd * 3600.0)
        np.testing.assert_allclose(d.dmp[0, n], expect, rtol=1e-12)
        np.testing.assert_allclose(d.dmp[n, 0], expect, rtol=1e-12)
        # divergence and stratospheric variants use their own timescales
        np.testing.assert_allclose(d.dmpd[0, n] * (DYN.thdd * 3600.0),
                                   d.dmp[0, n] * (DYN.thd * 3600.0),
                                   rtol=1e-12)
        expect_s = (n * (n + 1)) / (CFG.ntrun * (CFG.ntrun + 1)) \
            / (DYN.thds * 3600.0)
        np.testing.assert_allclose(d.dmps[0, n], expect_s, rtol=1e-12)

    def test_hordif_is_implicit_damping(self):
        import jax.numpy as jnp
        d = build_diffusion(CFG.ntrun, CFG.mx, CFG.nx)
        dt = CFG.delt2
        co = DiffusionCoefs(d, dt, dtype=jnp.float64)
        rng = np.random.default_rng(3)
        f = rng.standard_normal((CFG.kx, CFG.mx, 2, CFG.nx))
        fdt = rng.standard_normal((CFG.kx, CFG.mx, 2, CFG.nx))
        out = np.asarray(hordif(f, fdt, co.dmp, co.dmp1))
        dmp = d.dmp[None, :, None, :]
        np.testing.assert_allclose(out, (fdt - dmp * f) / (1.0 + dmp * dt),
                                   rtol=1e-12)
        # fixed point: a mode in exact balance (fdt = dmp*f) is untouched
        bal = np.asarray(hordif(f, dmp * f, co.dmp, co.dmp1))
        np.testing.assert_allclose(bal, 0.0, atol=1e-12)
