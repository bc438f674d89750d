"""End-to-end file-based training: synthetic ERA-schema files -> HybridModel.

Verifies the reference's training contract (speedy_res_interface.f90:439-723)
without the self-generated-truth path: files in, trained weights out,
closed-loop prediction steps run.
"""

import os

import numpy as np
import pytest

from speedyml.core.config import ReservoirConfig
from speedyml.domain.decomposition import build_layout
from speedyml.io.era import (era_file_name, tisr_file_name, write_era_year,
                             write_tisr_year)

IX, IL, KX = 12, 8, 2
T_PER_YEAR = 24     # 6 days of 6-hourly per synthetic "year"


def _make_year(rng, T=T_PER_YEAR):
    """Smooth low-amplitude fields: a learnable synthetic climate."""
    t = np.arange(T, dtype=np.float32)
    phase = 2 * np.pi * np.arange(IX, dtype=np.float32) / IX
    # (T, il, ix) traveling wave with latitude-dependent amplitude
    wave = (np.sin(phase[None, None, :] + 0.3 * t[:, None, None])
            * np.linspace(1, 2, IL, dtype=np.float32)[None, :, None])
    base = np.zeros((T, 4, KX, IL, IX), np.float32)
    base[:, 0] = 270.0
    atmo = (base + wave[:, None, None]
            + 0.05 * rng.normal(size=base.shape).astype(np.float32))
    atmo[:, 3] = np.abs(atmo[:, 3]) * 1e-4 + 1e-5       # q in kg/kg
    logp = (0.01 * wave + rng.normal(
        scale=0.002, size=(T, IL, IX))).astype(np.float32)
    sst = (290.0 + wave * 0.5).astype(np.float32)
    precip = (np.abs(wave) * 0.3).astype(np.float32)
    tisr = np.maximum(300.0 * np.cos(phase[None, None, :]
                                     + 0.5 * t[:, None, None]), 0.0)
    tisr = np.broadcast_to(tisr, (T, IL, IX)).astype(np.float32)
    return atmo.astype(np.float32), logp, sst, precip, tisr


@pytest.fixture(scope="module")
def era_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("era")
    era_dir = str(root / "era")
    model_dir = str(root / "model")
    os.makedirs(era_dir)
    os.makedirs(model_dir)
    rng = np.random.default_rng(7)
    for y in (1990, 1991):
        atmo, logp, sst, precip, tisr = _make_year(rng)
        write_era_year(era_file_name(era_dir, y), atmo, logp, sst=sst,
                       p6hr=precip)
        write_tisr_year(tisr_file_name(era_dir, y), tisr)
        # "imperfect model" = truth shifted/damped (a biased forecaster)
        m_atmo = np.roll(atmo, 1, axis=0) * 0.98
        m_logp = np.roll(logp, 1, axis=0) * 0.98
        write_era_year(os.path.join(model_dir, f"restart_6hour_y{y}.nc"),
                       m_atmo, m_logp, p6hr=np.roll(precip, 1, axis=0))
    return era_dir, model_dir


def _layout():
    return build_layout(ix=IX, il=IL, kx=KX, resx=2, resy=2, overlap=1)


def test_train_from_era_hybrid(era_tree):
    from speedyml.hybrid.era_training import train_from_era

    era_dir, model_dir = era_tree
    L = _layout()
    rcfg = ReservoirConfig(nodes_per_input=2 * L.n_in, degree=4,
                           noise_std=0.01, discardlength=24, synclength=24)
    hm, data, gv_truth = train_from_era(L, rcfg, era_dir, 1990, 1991,
                                        model_dir=model_dir, seed=0)
    assert data.truth.atmo.shape[0] == 2 * T_PER_YEAR
    assert gv_truth.shape == (2 * T_PER_YEAR, L.gv_len)
    w = np.asarray(hm.params.wout)
    assert np.isfinite(w).all() and np.abs(w).max() > 0

    # closed-loop: sync on the tail, then a prediction step runs
    import jax.numpy as jnp
    n_sync = rcfg.synclength // rcfg.timestep
    x = hm.synchronize(gv_truth[-n_sync:])
    x2, atmo, logp, precip = hm.step(x, jnp.asarray(gv_truth[-1]),
                                     jnp.asarray(gv_truth[-1]))
    assert np.isfinite(np.asarray(atmo)).all()
    assert atmo.shape == (4, KX, IL, IX)


def test_train_from_era_ml_only_analytic_tisr(era_tree, tmp_path):
    """No TISR files and no model states: analytic-diurnal fallback +
    ml_only training."""
    import shutil

    from speedyml.hybrid.era_training import train_from_era

    era_dir, _ = era_tree
    bare = str(tmp_path / "bare")
    os.makedirs(bare)
    for y in (1990, 1991):
        shutil.copy(era_file_name(era_dir, y), era_file_name(bare, y))
    L = _layout()
    rcfg = ReservoirConfig(nodes_per_input=2 * L.n_in, degree=4,
                           noise_std=0.01, discardlength=24)
    lat = np.deg2rad(np.linspace(-80, 80, IL))
    hm, data, gv = train_from_era(L, rcfg, bare, 1990, 1991, seed=1,
                                  slat=np.sin(lat), clat=np.cos(lat))
    assert hm.ml_only
    assert data.truth.tisr.shape == (2 * T_PER_YEAR, IL, IX)
    assert (data.truth.tisr >= 0).all() and data.truth.tisr.max() > 100.0
    assert np.isfinite(np.asarray(hm.params.wout)).all()


def test_era_path_never_uses_trajectory_runner(era_tree, monkeypatch):
    """The file path must not construct the self-generated-truth runner."""
    import speedyml.hybrid.forecast as fc
    from speedyml.hybrid.era_training import train_from_era

    def boom(*a, **k):
        raise AssertionError("TrajectoryRunner constructed on the ERA path")

    monkeypatch.setattr(fc.TrajectoryRunner, "__init__", boom)
    era_dir, model_dir = era_tree
    L = _layout()
    rcfg = ReservoirConfig(nodes_per_input=2 * L.n_in, degree=4,
                           discardlength=24)
    hm, _, _ = train_from_era(L, rcfg, era_dir, 1990, 1990,
                              model_dir=model_dir)
    assert hm is not None
