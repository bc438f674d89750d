"""Batched spherical-harmonic transforms for TPU.

Replaces the per-latitude scalar loops of the reference
(src/spe_spectral.f90:244-551, src/spe_subfft_fftpack.f90) with batched
einsum Legendre contractions + `jnp.fft.rfft/irfft` along longitude. All
operations accept arbitrary leading batch dimensions so fields x levels are
transformed in one fused XLA computation.

Layouts:
  spectral: complex (..., mx, nx)
  grid:     real    (..., il, ix)   row 0 = southernmost latitude
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .tables import SpectralTables, build_tables


def _shift_down(x):
    """out[..., n] = x[..., n-1] (zero at n=0)."""
    return jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], axis=-1)


def _shift_up(x):
    """out[..., n] = x[..., n+1] (zero at n=nx-1)."""
    return jnp.concatenate([x[..., 1:], jnp.zeros_like(x[..., :1])], axis=-1)


class SpectralTransform:
    """Device-resident transform operators.

    Instances hold small jnp constants; closing over them inside a jitted
    function embeds them as XLA constants.
    """

    def __init__(self, tables: SpectralTables | None = None,
                 dtype=jnp.float32):
        t = tables if tables is not None else build_tables()
        self.tables = t
        self.dtype = dtype
        self.cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        self.ix, self.il, self.iy = t.ix, t.il, t.iy
        self.mx, self.nx, self.ntrun = t.mx, t.nx, t.ntrun
        self.nfreq = t.ix // 2 + 1

        as_r = lambda x: jnp.asarray(x, dtype=dtype)
        self.leg_inv = as_r(t.leg_inv)      # (mx, nx, il)
        self.leg_fwd = as_r(t.leg_fwd)      # (mx, nx, il)
        self.el2 = as_r(t.el2)
        self.elm2 = as_r(t.elm2)
        self.el4 = as_r(t.el4)
        self.trfilt = as_r(t.trfilt)
        self.gradx = as_r(t.gradx)
        self.gradym = as_r(t.gradym)
        self.gradyp = as_r(t.gradyp)
        self.uvdx = as_r(t.uvdx)
        self.uvdym = as_r(t.uvdym)
        self.uvdyp = as_r(t.uvdyp)
        self.vddym = as_r(t.vddym)
        self.vddyp = as_r(t.vddyp)
        self.cosgr = as_r(t.cosgr)
        self.cosgr2 = as_r(t.cosgr2)
        self.coriol = as_r(t.coriol)

    # ------------------------------------------------------------------
    # core transforms
    # ------------------------------------------------------------------
    def spec_to_fourier(self, spec):
        """(..., mx, nx) complex -> (..., il, mx) complex (gridy equivalent)."""
        return jnp.einsum("...mn,mnj->...jm", spec,
                          self.leg_inv.astype(spec.dtype))

    def fourier_to_grid(self, fourier, kcos: int = 1):
        """(..., il, mx) complex -> (..., il, ix) real (gridx equivalent).

        kcos=2 divides by cos(lat) (for U*cos -> U etc.), matching
        spe_subfft_fftpack.f90:45-49.
        """
        shape = fourier.shape[:-1] + (self.nfreq,)
        buf = jnp.zeros(shape, dtype=fourier.dtype)
        # drop imaginary part of the zonal-mean coefficient (reference drops
        # varm(2,j); spe_subfft_fftpack.f90:31)
        f0 = fourier.at[..., 0].set(fourier[..., 0].real.astype(fourier.dtype))
        buf = buf.at[..., : self.mx].set(f0)
        grid = jnp.fft.irfft(buf, n=self.ix, axis=-1) * self.ix
        grid = grid.astype(self.dtype)
        if kcos == 2:
            grid = grid * self.cosgr[..., :, None]
        return grid

    def grid_to_fourier(self, grid):
        """(..., il, ix) real -> (..., il, mx) complex (specx equivalent)."""
        coeff = jnp.fft.rfft(grid.astype(self.dtype), axis=-1) / self.ix
        coeff = coeff[..., : self.mx].astype(self.cdtype)
        # zero imaginary part of zonal mean (spe_subfft_fftpack.f90:81)
        return coeff.at[..., 0].set(coeff[..., 0].real.astype(coeff.dtype))

    def fourier_to_spec(self, fourier):
        """(..., il, mx) complex -> (..., mx, nx) complex (specy equivalent)."""
        return jnp.einsum("...jm,mnj->...mn", fourier,
                          self.leg_fwd.astype(fourier.dtype))

    def spec_to_grid(self, spec, kcos: int = 1):
        """Spectral -> grid (reference `grid`, spe_spectral.f90:389-401)."""
        return self.fourier_to_grid(self.spec_to_fourier(spec), kcos)

    def grid_to_spec(self, grid):
        """Grid -> spectral (reference `spec`, spe_spectral.f90:403-414)."""
        return self.fourier_to_spec(self.grid_to_fourier(grid))

    # ------------------------------------------------------------------
    # spectral-space operators
    # ------------------------------------------------------------------
    def lap(self, spec):
        """Laplacian (spe_spectral.f90:244-254)."""
        return -spec * self.el2

    def invlap(self, spec):
        """Inverse Laplacian (spe_spectral.f90:256-269)."""
        return -spec * self.elm2

    def trunct(self, spec):
        """Triangular truncation filter (spe_spectral.f90:540-551)."""
        return spec * self.trfilt

    def grad(self, psi):
        """Spectral gradient (spe_spectral.f90:271-305).

        Returns (psdx, psdy); psdx = i*m/a * psi, psdy the meridional
        recurrence coupling n-1 / n+1.
        """
        psdx = 1j * self.gradx[:, None] * psi
        psdy = (-self.gradym * _shift_down(psi)
                + self.gradyp * _shift_up(psi))
        return psdx, psdy

    def uvspec(self, vorm, divm):
        """(vor, div) -> (U*cos, V*cos) spectral (spe_spectral.f90:351-387)."""
        zp = 1j * self.uvdx * vorm
        zc = 1j * self.uvdx * divm
        ucosm = (self.uvdym * _shift_down(vorm)
                 - self.uvdyp * _shift_up(vorm) + zc)
        vcosm = (-self.uvdym * _shift_down(divm)
                 + self.uvdyp * _shift_up(divm) + zp)
        return ucosm, vcosm

    def vds(self, ucosm, vcosm):
        """(U*cos, V*cos) spectral -> (vor, div) (spe_spectral.f90:307-349)."""
        zp = 1j * self.gradx[:, None] * ucosm
        zc = 1j * self.gradx[:, None] * vcosm
        vorm = (self.vddym * _shift_down(ucosm)
                - self.vddyp * _shift_up(ucosm) + zc)
        divm = (-self.vddym * _shift_down(vcosm)
                + self.vddyp * _shift_up(vcosm) + zp)
        return vorm, divm

    def vdspec(self, ug, vg, kcos: int = 2):
        """Grid (u, v) -> spectral (vor, div) (spe_spectral.f90:416-452).

        kcos=2: inputs are true u,v -> scale by 1/cos; otherwise 1/cos^2
        (inputs already have a cos factor).
        """
        scale = self.cosgr if kcos == 2 else self.cosgr2
        ug1 = ug * scale[:, None]
        vg1 = vg * scale[:, None]
        um = self.fourier_to_spec(self.grid_to_fourier(ug1))
        vm = self.fourier_to_spec(self.grid_to_fourier(vg1))
        return self.vds(um, vm)

    def uv_grid(self, vorm, divm):
        """Spectral (vor, div) -> grid (u, v) (as used in dyn_grtend.f90:70-72)."""
        ucosm, vcosm = self.uvspec(vorm, divm)
        ug = self.spec_to_grid(ucosm, kcos=2)
        vg = self.spec_to_grid(vcosm, kcos=2)
        return ug, vg
