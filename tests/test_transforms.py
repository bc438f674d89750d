"""Spectral transform correctness tests.

Strategy (SURVEY.md section 4): golden-value tests for the transforms via
(a) round-trip identity on truncated fields, (b) analytic spherical harmonics,
(c) operator identities (Laplacian eigenvalues, vds(uvspec) == id).

The transform uses the real (mx, 2, nx) pair layout; tests build complex
oracles and convert via to_real/to_complex.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from speedyml.transforms.tables import build_tables, gauss_legendre
from speedyml.transforms.spectral import SpectralTransform, to_real, to_complex


@pytest.fixture(scope="module")
def T():
    return SpectralTransform(build_tables(), dtype=jnp.float64)


def random_cspec(T, seed=0, triangular=True, batch=()):
    """Random complex spectral coefficients with the model's structure."""
    rng = np.random.default_rng(seed)
    c = rng.normal(size=batch + (T.mx, T.nx)) + 1j * rng.normal(
        size=batch + (T.mx, T.nx))
    c[..., 0, :] = c[..., 0, :].real  # zonal-mean coefficients are real
    tab = T.tables
    mask = np.asarray(tab.trfilt) if triangular else (
        (np.arange(T.mx)[:, None] + np.arange(T.nx)[None, :]) <= T.ntrun + 1)
    return c * mask


def rspec(c):
    return jnp.asarray(to_real(c))


class TestGauss:
    def test_weights_sum(self):
        sia, wt = gauss_legendre(24)
        assert abs(wt.sum() - 1.0) < 1e-13
        assert np.all(np.diff(sia) < 0)  # pole -> equator ordering

    def test_roots_of_legendre(self):
        from numpy.polynomial.legendre import legval
        sia, _ = gauss_legendre(24)
        coef = np.zeros(49)
        coef[48] = 1.0
        assert np.max(np.abs(legval(sia, coef))) < 1e-12


class TestRoundTrip:
    def test_spec_grid_spec(self, T):
        """spec(grid(x)) == x for triangularly truncated x (the allclose gate)."""
        c = random_cspec(T, seed=1)
        y = T.trunct(T.grid_to_spec(T.spec_to_grid(rspec(c))))
        np.testing.assert_allclose(to_complex(np.asarray(y)), c, atol=1e-12)

    def test_batched_round_trip(self, T):
        c = random_cspec(T, seed=2, batch=(3, 8))
        y = T.trunct(T.grid_to_spec(T.spec_to_grid(rspec(c))))
        np.testing.assert_allclose(to_complex(np.asarray(y)), c, atol=1e-12)

    def test_grid_spec_grid_smooth(self, T):
        """A band-limited grid field survives grid->spec->grid."""
        lon = 2 * np.pi * np.arange(T.ix) / T.ix
        lat = np.asarray(T.tables.radang)
        g = (np.cos(3 * lon)[None, :] * np.cos(lat)[:, None] ** 3
             + np.sin(lat)[:, None] ** 2)
        g2 = T.spec_to_grid(T.grid_to_spec(jnp.asarray(g)))
        np.testing.assert_allclose(np.asarray(g2), g, atol=1e-12)

    def test_host_matches_device_path(self, T):
        """host_* numpy transforms == jnp transforms."""
        c = random_cspec(T, seed=9)
        r = to_real(c)
        np.testing.assert_allclose(T.host_spec_to_grid(r),
                                   np.asarray(T.spec_to_grid(rspec(c))),
                                   atol=1e-12)
        g = T.host_spec_to_grid(r)
        np.testing.assert_allclose(T.host_grid_to_spec(g),
                                   np.asarray(T.grid_to_spec(jnp.asarray(g))),
                                   atol=1e-12)


class TestAnalytic:
    def test_zonal_mean_is_first_coefficient(self, T):
        """Area-weighted global mean = Re(c[0,0]) / sqrt(2)."""
        c = random_cspec(T, seed=3)
        g = np.asarray(T.spec_to_grid(rspec(c)))
        wt_full = np.concatenate([T.tables.wt, T.tables.wt[::-1]]) / 2.0
        mean = (g.mean(axis=1) * wt_full).sum()
        np.testing.assert_allclose(mean, c[0, 0].real / np.sqrt(2), atol=1e-12)

    def test_spherical_harmonic_laplacian(self, T):
        """lap(Y_lm) = -l(l+1)/a^2 Y_lm through the full grid round trip."""
        a = 6.371e6
        for (m, n) in [(0, 2), (3, 1), (5, 0), (10, 4)]:
            l = m + n
            c = np.zeros((T.mx, T.nx), dtype=complex)
            c[m, n] = 1.0 + (0.5j if m > 0 else 0.0)
            g = T.spec_to_grid(rspec(c))
            back = T.trunct(T.grid_to_spec(g))
            lap_g = to_complex(np.asarray(T.lap(back)))
            expect = -l * (l + 1) / a**2 * to_complex(np.asarray(back))
            np.testing.assert_allclose(lap_g, expect, atol=1e-18)

    def test_analytic_y11(self, T):
        """Grid values of the m=1,l=1 harmonic match the analytic form."""
        c = np.zeros((T.mx, T.nx), dtype=complex)
        c[1, 0] = 1.0
        g = np.asarray(T.spec_to_grid(rspec(c)))
        lon = 2 * np.pi * np.arange(T.ix) / T.ix
        lat = np.asarray(T.tables.radang)
        p11 = np.sqrt(3.0) / 2.0 * np.cos(lat)
        expect = 2 * p11[:, None] * np.cos(lon)[None, :]
        np.testing.assert_allclose(g, expect, atol=1e-12)


class TestWindOperators:
    def test_vds_of_uvspec_identity(self, T):
        """vor/div -> ucos/vcos -> vor/div recovers the truncated input."""
        cv = random_cspec(T, seed=5)
        cd = random_cspec(T, seed=6)
        cv[0, 0] = 0.0
        cd[0, 0] = 0.0
        vor, div = rspec(cv), rspec(cd)
        ucosm, vcosm = T.uvspec(vor, div)
        ug = T.spec_to_grid(ucosm, kcos=2)
        vg = T.spec_to_grid(vcosm, kcos=2)
        vor2, div2 = T.vdspec(ug, vg, kcos=2)
        np.testing.assert_allclose(to_complex(np.asarray(T.trunct(vor2))), cv,
                                   rtol=1e-10, atol=1e-10)
        np.testing.assert_allclose(to_complex(np.asarray(T.trunct(div2))), cd,
                                   rtol=1e-10, atol=1e-10)

    def test_grad_zonal_derivative(self, T):
        """psdx = i m / a * psi."""
        c = random_cspec(T, seed=7)
        psdx, _ = T.grad(rspec(c))
        m = np.arange(T.mx)
        expect = 1j * m[:, None] / 6.371e6 * c
        np.testing.assert_allclose(to_complex(np.asarray(psdx)), expect,
                                   atol=1e-18)

    def test_grad_matches_finite_difference(self, T):
        """Meridional gradient against dense-latitude finite differences."""
        c = np.zeros((T.mx, T.nx), dtype=complex)
        c[2, 3] = 1.0
        _, psdy = T.grad(rspec(c))
        gy = np.asarray(T.spec_to_grid(psdy, kcos=2))
        g = np.asarray(T.spec_to_grid(rspec(c)))
        lat = np.asarray(T.tables.radang)
        a = 6.371e6
        dlat = np.gradient(lat)
        dgdlat = np.gradient(g, axis=0) / dlat[:, None] / a
        err = np.abs(gy[5:-5] - dgdlat[5:-5]).max() / np.abs(gy).max()
        assert err < 2.5e-2  # 2nd-order FD truncation error on 48 latitudes
