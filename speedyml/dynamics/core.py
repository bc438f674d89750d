"""The semi-implicit leapfrog dynamical core.

Re-design of the reference's stepping machinery (src/dyn_step.f90,
src/ini_stepone.f90, src/dyn_stloop.f90) as pure jittable functions over a
`SpectralState` pytree. The three (dt, implicit-table) variants needed by the
stepone bootstrap are all precomputed at construction; the main integration
is a `lax.scan` over leapfrog steps so a whole day compiles to one XLA
program.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ModelConfig
from ..core.constants import PHYS, DYN
from ..core.vertical import make_vertical_grid
from ..transforms.tables import build_tables
from ..transforms.spectral import SpectralTransform
from .state import SpectralState, PrognosticFields, Tendencies
from .implicit import ImplicitTables, ImplicitCoefs, build_implicit, geopotential
from .hdiff import build_diffusion, DiffusionCoefs, hordif
from .tendencies import grtend, sptend
from .implicit import implicit_correction


class Forcing(NamedTuple):
    """Date-dependent spectral correction fields (updated daily by fordate;
    reference mod_hdifcon.f90 tcorh/qcorh)."""

    tcorh: jax.Array   # (mx, 2, nx) real-pair spectral
    qcorh: jax.Array   # (mx, 2, nx)


class Dycore:
    """Holds all static coefficients; exposes pure step functions."""

    def __init__(self, config: ModelConfig = ModelConfig(),
                 orog: Optional[np.ndarray] = None):
        self.config = config
        dtype = jnp.float64 if config.dtype == "float64" else jnp.float32
        self.dtype = dtype
        self.cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64

        tables = build_tables(config.ntrun, config.ix, config.il)
        self.tables = tables
        self.T = SpectralTransform(tables, dtype=dtype)
        self.vg = make_vertical_grid(config.kx)
        np_dtype = np.float64 if dtype == jnp.float64 else np.float32
        # host (numpy) constants — embedded into jitted programs directly
        self.vg_jnp = {k: np.asarray(getattr(self.vg, k), dtype=np_dtype)
                       for k in ("hsg", "dhs", "fsg", "dhsr", "fsgr",
                                  "xgeop1", "xgeop2")}
        self.coriol = np.asarray(tables.coriol, dtype=np_dtype)
        self.akap = PHYS.akap
        self.rgas = PHYS.rgas
        self.sdrag = 1.0 / (DYN.tdrs * 3600.0)
        # opt-in reduced-precision grid-space tendency compute (see
        # ModelConfig.grid_compute); None = full precision
        self.grid_dtype = (jnp.bfloat16
                           if getattr(config, "grid_compute", "float32")
                           == "bfloat16" else None)

        # surface geopotential: spec(grav*orog) truncated (ini_invars.f90:31-34)
        # computed entirely host-side (numpy)
        if orog is None:
            orog = np.zeros((config.il, config.ix))
        phi0 = PHYS.grav * np.asarray(orog, dtype=np.float64)
        phis = self.T.host_trunct(self.T.host_grid_to_spec(phi0))
        self.phis = np.asarray(phis, np_dtype)       # real layout (mx, 2, nx)
        self.phis0_grid = np.asarray(self.T.host_spec_to_grid(phis), np_dtype)
        self.orog_raw = np.asarray(phi0, np_dtype)

        # implicit + diffusion tables for the three dt values of the bootstrap
        dt2 = config.delt2
        diff = build_diffusion(config.ntrun, config.mx, config.nx)
        self._imp = {}
        self._dif = {}
        for key, dtv in (("half", 0.5 * config.delt), ("delt", config.delt),
                         ("delt2", dt2)):
            self._imp[key] = ImplicitCoefs(
                build_implicit(self.vg, dtv, config.alph, config.mx, config.nx),
                dtype=dtype)
            self._dif[key] = DiffusionCoefs(diff, dtv, dtype=dtype)
        self.imp_main = self._imp["delt2"]

        # orographic-correction vertical profiles (ini_indyns.f90:114-127)
        rgam = PHYS.rgas * DYN.gamma / (1000.0 * PHYS.grav)
        qexp = DYN.hscale / DYN.hshum
        fsg = self.vg.fsg
        tcorv = np.zeros(config.kx)
        qcorv = np.zeros(config.kx)
        tcorv[1:] = fsg[1:] ** rgam
        qcorv[2:] = fsg[2:] ** qexp
        self.tcorv = np.asarray(tcorv, np_dtype)
        self.qcorv = np.asarray(qcorv, np_dtype)

    def zero_forcing(self) -> Forcing:
        np_dtype = np.float64 if self.dtype == jnp.float64 else np.float32
        z = np.zeros((self.config.mx, 2, self.config.nx), dtype=np_dtype)
        return Forcing(tcorh=z, qcorh=z)

    # ------------------------------------------------------------------
    def _diffuse(self, state: SpectralState, tend: Tendencies,
                 forcing: Forcing, dif: DiffusionCoefs) -> Tendencies:
        """Horizontal diffusion + stratospheric drag (dyn_step.f90:60-106)."""
        cfg = self.config
        vor0, div0, t0, tr0 = state.vor[0], state.div[0], state.t[0], state.tr[0]

        vordt = hordif(vor0, tend.vordt, dif.dmp, dif.dmp1)
        divdt = hordif(div0, tend.divdt, dif.dmpd, dif.dmp1d)
        ctmp = t0 + forcing.tcorh[None] * self.tcorv[:, None, None, None]
        tdt = hordif(ctmp, tend.tdt, dif.dmp, dif.dmp1)

        # stratospheric zonal-mean drag on the top level (dyn_step.f90:78-82)
        vordt = vordt.at[0, 0, :].add(-self.sdrag * vor0[0, 0, :])
        divdt = divdt.at[0, 0, :].add(-self.sdrag * div0[0, 0, :])

        # extra del^2 stratospheric diffusion on the top level
        vordt = vordt.at[0].set(hordif(vor0[0], vordt[0], dif.dmps, dif.dmp1s))
        divdt = divdt.at[0].set(hordif(div0[0], divdt[0], dif.dmps, dif.dmp1s))
        tdt = tdt.at[0].set(hordif(ctmp[0], tdt[0], dif.dmps, dif.dmp1s))

        # tracers: humidity (tracer 0) uses dmpd with orographic correction
        qtmp = tr0.at[0].add(forcing.qcorh[None]
                             * self.qcorv[:, None, None, None])
        trdt = tend.trdt.at[0].set(
            hordif(qtmp[0], tend.trdt[0], dif.dmpd, dif.dmp1d))
        if cfg.ntr > 1:
            trdt = trdt.at[1:].set(
                hordif(qtmp[1:], trdt[1:], dif.dmp, dif.dmp1))
        return Tendencies(vordt=vordt, divdt=divdt, tdt=tdt, psdt=tend.psdt,
                          trdt=trdt)

    def _timint(self, field, fdt, j1: int, dt: float, eps: float, wil: float):
        """Leapfrog with Robert-Williams filter (dyn_step.f90:153-190).

        field: (2, ...) both time levels; fdt truncated tendency.
        """
        fdt = self.T.trunct(fdt)
        fj = field[j1]
        fnew = field[0] + dt * fdt
        f0 = fj + wil * eps * (field[0] - 2 * fj + fnew)
        f1 = fnew - (1 - wil) * eps * (f0 - 2 * fj + fnew)
        return jnp.stack([f0, f1], axis=0)

    def step(self, state: SpectralState, forcing: Forcing, j1: int, j2: int,
             dt_key: str, phys_fn: Optional[Callable] = None):
        """One (forward or leapfrog) time step (dyn_step.f90:1-128).

        j1/j2 are 0-based time-level indices (reference's J1-1/J2-1):
          j1=0, j2=0: forward step; j1=0, j2=1: initial leapfrog;
          j1=1, j2=1: filtered leapfrog.

        Returns the new state, or (state, extras) when phys_fn is given.
        """
        cfg = self.config
        imp = self._imp[dt_key]
        dif = self._dif[dt_key]
        dt = {"half": 0.5 * cfg.delt, "delt": cfg.delt,
              "delt2": cfg.delt2}[dt_key]

        tend, extras = grtend(self, state.at_level(j2), state.at_level(0),
                              phys_fn)
        if cfg.alph == 0.0:
            tend = sptend(self, state.at_level(j2), tend, imp)
        else:
            tend = sptend(self, state.at_level(0), tend, imp)
            divdt, tdt, psdt = implicit_correction(imp, tend.divdt, tend.tdt,
                                                   tend.psdt)
            tend = Tendencies(vordt=tend.vordt, divdt=divdt, tdt=tdt,
                              psdt=psdt, trdt=tend.trdt)

        tend = self._diffuse(state, tend, forcing, dif)

        eps = 0.0 if j1 == 0 else cfg.rob
        wil = cfg.wil
        ti = functools.partial(self._timint, j1=j1, dt=dt, eps=eps, wil=wil)
        new_state = SpectralState(
            vor=ti(state.vor, tend.vordt),
            div=ti(state.div, tend.divdt),
            t=ti(state.t, tend.tdt),
            ps=ti(state.ps, tend.psdt),
            tr=ti(state.tr, tend.trdt),
        )
        if phys_fn is None:
            return new_state
        return new_state, extras

    # ------------------------------------------------------------------
    def stepone(self, state: SpectralState, forcing: Forcing,
                phys_fn: Optional[Callable] = None):
        """Initial forward + leapfrog half-steps (ini_stepone.f90:14-31)."""
        if phys_fn is None:
            state = self.step(state, forcing, 0, 0, "half")
            state = self.step(state, forcing, 0, 1, "delt")
            return state
        state, extras = self.step(state, forcing, 0, 0, "half", phys_fn)
        state, extras = self.step(state, forcing, 0, 1, "delt", phys_fn)
        return state, extras

    def make_scan_step(self, phys_fn: Optional[Callable] = None):
        """Returns a jittable f(state, forcing) for the main leapfrog loop."""
        def f(state, forcing):
            return self.step(state, forcing, 1, 1, "delt2", phys_fn)
        return f

    def run_steps(self, state: SpectralState, forcing: Forcing, nsteps: int,
                  phys_fn: Optional[Callable] = None) -> SpectralState:
        """Integrate nsteps leapfrog steps under one lax.scan."""
        step_fn = self.make_scan_step(phys_fn)

        def body(s, _):
            return step_fn(s, forcing), None

        state, _ = jax.lax.scan(body, state, None, length=nsteps)
        return state
