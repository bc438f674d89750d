"""Golden-oracle validation of the static spectral tables.

The image has no Fortran compiler, so the compiled reference cannot be run
for golden output; instead every table the reference builds in
`parmtr`/`lgndre`/`gaussl` (src/spe_spectral.f90:2-242) is validated against
an INDEPENDENT mathematical oracle:

  * Gaussian nodes/weights  -> numpy.polynomial.legendre.leggauss
  * normalized associated Legendre values -> scipy.special.lpmv with the
    explicit (2l+1)/2 (l-m)!/(l+m)! normalization (no Condon-Shortley phase,
    matching the reference's positive recursion)
  * derivative-coupling tables (gradym/gradyp, uvd*, vdd*) -> closed-form
    epsilon expressions from the spherical-harmonic recurrence
"""

import math

import numpy as np
import pytest
from scipy.special import lpmv

from speedyml.transforms.tables import (_legendre_poly, build_tables,
                                        gauss_legendre)


def normalized_plm(l: int, m: int, x: float) -> float:
    """Oracle: P̄_l^m(x) with unit L2 norm on [-1,1], positive convention."""
    if m > l:
        return 0.0
    norm = math.sqrt((2 * l + 1) / 2.0
                     * math.factorial(l - m) / math.factorial(l + m))
    # scipy lpmv includes the Condon-Shortley (-1)^m; cancel it.
    return norm * ((-1.0) ** m) * float(lpmv(m, l, x))


class TestGaussianQuadrature:
    def test_nodes_and_weights_vs_numpy(self):
        iy = 24
        sia, wt = gauss_legendre(iy)
        x_ref, w_ref = np.polynomial.legendre.leggauss(2 * iy)
        # reference orders positive roots pole->equator (descending)
        pos = x_ref > 0
        np.testing.assert_allclose(sia, x_ref[pos][::-1], atol=1e-13)
        np.testing.assert_allclose(wt, w_ref[pos][::-1], atol=1e-13)


class TestLegendreOracle:
    @pytest.mark.parametrize("x", [0.03125, 0.45, 0.87, 0.995])
    def test_alp_matches_scipy(self, x):
        mx, nx = 31, 32
        coa = math.sqrt(1.0 - x * x)
        alp = _legendre_poly(x, coa, mx, nx)
        # the reference table stores sqrt(2) * P̄ (alp[0,0] = sqrt(0.5) is
        # P̄_0^0 = 1/sqrt(2) scaled so the m=0 Fourier convention works out);
        # determine the single scale from (0,0) and check ALL entries.
        scale = alp[0, 0] / normalized_plm(0, 0, x)
        for m in range(0, mx, 5):
            for n in range(0, nx, 5):
                l = m + n
                want = scale * normalized_plm(l, m, x)
                np.testing.assert_allclose(
                    alp[m, n], want, rtol=1e-10, atol=1e-12,
                    err_msg=f"alp[m={m}, n={n}] (l={l}) at x={x}")

    def test_full_grid_table_consistency(self):
        """cpol rows of build_tables equal the per-latitude oracle."""
        t = build_tables()
        h = 7  # an arbitrary hemisphere row
        x = t.sia_half[h]
        alp = _legendre_poly(x, math.sqrt(1 - x * x), t.mx, t.nx)
        # leg_inv northern row il-1-h = cpol * mask (l <= ntrun+1)
        m, n = 10, 4
        assert m + n <= t.ntrun + 1
        np.testing.assert_allclose(t.leg_inv[m, n, t.il - 1 - h], alp[m, n],
                                   rtol=1e-12)
        # southern row picks up parity (-1)^n
        np.testing.assert_allclose(t.leg_inv[m, 5, h], -alp[m, 5], rtol=1e-12)

    def test_forward_inverse_orthogonality(self):
        """leg_fwd is the exact quadrature inverse of leg_inv: for every m,
        sum_j leg_fwd[m,n,j] leg_inv[m,n',j] = delta(n,n') on kept modes."""
        t = build_tables()
        for m in (0, 1, 13, 30):
            G = np.einsum("nj,pj->np", t.leg_fwd[m], t.leg_inv[m])
            keep = np.where((m + np.arange(t.nx)) <= t.ntrun)[0]
            np.testing.assert_allclose(G[np.ix_(keep, keep)],
                                       np.eye(len(keep)), atol=1e-11)


class TestCouplingTablesOracle:
    """Closed-form checks of the derivative couplings (spe_spectral.f90:130-178).

    With eps(l,m) = sqrt((l^2-m^2)/(4l^2-1)) the meridional-derivative
    recurrence gives d/dmu couplings (1/a factors): gradym = (l-1) eps(l,m)/a,
    gradyp = (l+2) eps(l+1,m)/a, and the u/v inversion couplings
    uvdx = -a m/(l(l+1)), uvdym = -a eps(l,m)/l, uvdyp = -a eps(l+1,m)/(l+1).
    """

    @staticmethod
    def eps(l, m):
        return math.sqrt((l * l - m * m) / (4.0 * l * l - 1.0))

    def test_tables_match_closed_form(self):
        t = build_tables()
        a = 6.371e6
        np.testing.assert_allclose(t.gradx, np.arange(t.mx) / a, rtol=1e-6)
        for m in (0, 2, 17, 30):
            for n in (1, 3, 10):
                l = m + n
                np.testing.assert_allclose(
                    t.gradym[m, n], (l - 1) * self.eps(l, m) / t_a(t), rtol=1e-12)
                np.testing.assert_allclose(
                    t.gradyp[m, n], (l + 2) * self.eps(l + 1, m) / t_a(t),
                    rtol=1e-12)
                np.testing.assert_allclose(
                    t.uvdx[m, n], -t_a(t) * m / (l * (l + 1.0)), rtol=1e-12)
                np.testing.assert_allclose(
                    t.uvdym[m, n], -t_a(t) * self.eps(l, m) / l, rtol=1e-12)
                np.testing.assert_allclose(
                    t.uvdyp[m, n], -t_a(t) * self.eps(l + 1, m) / (l + 1.0),
                    rtol=1e-12)
                np.testing.assert_allclose(
                    t.vddym[m, n], (l + 1.0) * self.eps(l, m) / t_a(t),
                    rtol=1e-12)
                np.testing.assert_allclose(
                    t.vddyp[m, n], l * self.eps(l + 1, m) / t_a(t), rtol=1e-12)

    def test_laplacian_eigenvalues(self):
        t = bt = build_tables()
        ll = np.add.outer(np.arange(bt.mx), np.arange(bt.nx)).astype(float)
        np.testing.assert_allclose(t.el2, ll * (ll + 1) / t_a(t) ** 2,
                                   rtol=1e-12)


def t_a(t) -> float:
    from speedyml.core.constants import PHYS
    return PHYS.rearth
