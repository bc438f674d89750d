"""Slab-ocean reservoir tests (reference: mod_slab_ocean_reservoir.f90)."""

import numpy as np
import jax.numpy as jnp

from speedyml.reservoir.slab import (build_ocean_layout, compose_week_inputs,
                                     train_ocean, weekly_average,
                                     weekly_ocean_inputs)
from speedyml.hybrid.experiment import (HybridRunner, train_hybrid,
                                        transform_and_pack)
from tests.test_hybrid import _small_layout, _small_rcfg, _synthetic_truth


def _ocean_rcfg(**kw):
    # fast weekly cadence for tests: 4 atmo steps per "week"
    return _small_rcfg(timestep_slab=24, slab_nodes=400,
                       slab_noise_std=0.02, sst_variance_threshold=0.2, **kw)


def test_ocean_layout_maps():
    L = _small_layout()
    ol = build_ocean_layout(L)
    assert ol.n_in == (L.nvars + 3) * L.inpy * L.inpx
    assert ol.n_out == L.resy * L.resx
    # input sst section must point into the gv sst section
    s0, s1 = ol.sections["sst"]
    g0, g1 = L.gv_sizes["sst"]
    assert np.all(ol.input_index[:, s0:s1] >= g0)
    assert np.all(ol.input_index[:, s0:s1] < g1)
    # target indices are core points of the sst section, all distinct
    assert np.all(ol.target_index >= g0) and np.all(ol.target_index < g1)
    flat = ol.target_index.reshape(-1)
    assert len(np.unique(flat)) == len(flat) == L.il * L.ix
    # bottom-level atmo inputs point into the last sigma level's slab
    a0, a1 = ol.sections["atmo_bot"]
    ga0 = L.gv_sizes["atmo3d"][0]
    ngp = L.il * L.ix
    lev = (ol.input_index[:, a0:a1] - ga0) // ngp % L.kx
    assert np.all(lev == L.kx - 1)


def test_weekly_average():
    T, n = 12, 7
    s = np.arange(T * n, dtype=np.float64).reshape(T, n)
    w = weekly_average(s, 4)
    assert w.shape == (3, n)
    np.testing.assert_allclose(w[0], s[:4].mean(axis=0))


def test_weekly_ocean_input_mixing():
    """The reference averages ONLY the atmosphere blocks over the week
    (rolling_average_over_a_period_2d on atmo3d_start:logp_end,
    mod_slab_ocean_reservoir.f90:398); SST/TISR stay instantaneous values at
    the week boundary. Pin that mixing for both the training-series builder
    and the prediction-time composer."""
    L = _small_layout()
    T, spw = 8, 4
    rng = np.random.default_rng(0)
    s = rng.normal(size=(T, L.gv_len)).astype(np.float32)
    w = weekly_ocean_inputs(s, spw, L)
    assert w.shape == (2, L.gv_len)
    for name in ("atmo3d", "logp"):
        s0, s1 = L.gv_sizes[name]
        np.testing.assert_allclose(w[0, s0:s1], s[:spw, s0:s1].mean(0),
                                   rtol=1e-6)
    for name in ("sst", "tisr", "precip"):
        s0, s1 = L.gv_sizes[name]
        np.testing.assert_allclose(w[0, s0:s1], s[spw - 1, s0:s1])
        np.testing.assert_allclose(w[1, s0:s1], s[2 * spw - 1, s0:s1])
    # prediction-time composer must agree with the training-series builder
    gv_sum = s[:spw].sum(axis=0)
    c = np.asarray(compose_week_inputs(jnp.asarray(s[spw - 1]),
                                       jnp.asarray(gv_sum), spw, L))
    np.testing.assert_allclose(c, w[0], rtol=1e-6)


def test_train_ocean_and_predict():
    """Trained slab reservoirs beat persistence-of-climatology on the
    synthetic SST wave (train_slab_ocean_model ->
    predict_slab_ml, mod_slab_ocean_reservoir.f90:172-269, 1318-1363)."""
    L = _small_layout()
    rcfg = _ocean_rcfg()
    T = 800
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, T, seed=21)
    gv = transform_and_pack(L, atmo, logp, precip, sst, tisr,
                            rcfg.precip_epsilon)
    om = train_ocean(L, rcfg, gv, seed=5)
    spw = om.steps_per_week
    assert spw == 4
    assert om.active.any(), "synthetic SST varies: some regions active"

    # sync on the mixed weekly inputs, then predict one week ahead
    gv_w = weekly_ocean_inputs(gv, spw, L)
    Tw = gv_w.shape[0]
    x = om.synchronize(gv_w[:Tw - 2])
    x, sst_core = om.step(x, gv_w[Tw - 2])
    # truth at end of week Tw-1
    end = (Tw - 1) * spw + spw - 1
    true_sst = gv[end][om.ol.target_index]
    pred_err = np.abs(np.asarray(sst_core) - true_sst)[om.active].mean()
    clim_err = np.abs(np.asarray(om.stz.out_mean) - true_sst)[om.active].mean()
    assert pred_err < 0.6 * clim_err, (pred_err, clim_err)

    # compose_sst: active cores replaced, everything >= 271 K
    clim = np.full((L.il, L.ix), 290.0)
    grid = om.compose_sst(np.asarray(sst_core), clim, L)
    assert grid.shape == (L.il, L.ix)
    assert grid.min() >= 271.0
    n_active_pts = om.active.sum() * om.ol.n_out
    assert (grid != 290.0).sum() <= n_active_pts


def test_ocean_with_ohtc():
    """Optional OHTC input + prediction (mod_slab_ocean_reservoir.f90
    ohtc_prediction; read_ohtc_parallel_training)."""
    from speedyml.domain.decomposition import build_layout
    L = build_layout(ix=12, il=6, kx=2, nvars=4, resx=2, resy=2, overlap=1,
                     use_ohtc=True)
    rcfg = _ocean_rcfg()
    T = 600
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, T, seed=41)
    ohtc = 1.5e9 + 1e8 * np.sin(
        np.linspace(0, 20, T)[:, None, None]
        + np.linspace(0, 3, L.il)[None, :, None])
    ohtc = np.broadcast_to(ohtc, (T, L.il, L.ix))
    gv = transform_and_pack(L, atmo, logp, precip, sst, tisr,
                            rcfg.precip_epsilon, ohtc=ohtc)
    om = train_ocean(L, rcfg, gv, seed=8)
    ncore = L.resy * L.resx
    assert om.ol.n_out == 2 * ncore
    s0, s1 = om.ol.sections["ohtc"]
    assert s1 > s0
    spw = om.steps_per_week
    gv_w = weekly_ocean_inputs(gv, spw, L)
    x = om.synchronize(gv_w[:-1])
    x, out = om.step(x, gv_w[-1])
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # ohtc predictions come back in physical units (~1.5e9)
    assert 1e9 < np.abs(out[:, ncore:]).mean() < 2e9
    grid = om.compose_sst(out, np.full((L.il, L.ix), 290.0), L)
    assert grid.shape == (L.il, L.ix)


def test_calibrate_gate_open_loop():
    """calibrate_gate sets the anomaly gate to the OPEN-LOOP residual scale
    and compose_sst then clips predictions to 3x demonstrated skill."""
    L = _small_layout()
    rcfg = _ocean_rcfg()
    T = 800
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, T, seed=21)
    gv = transform_and_pack(L, atmo, logp, precip, sst, tisr,
                            rcfg.precip_epsilon)
    om = train_ocean(L, rcfg, gv, seed=5)
    grid, ol_rms, p_rms = om.calibrate_gate(gv, L)
    assert grid.shape == (L.il, L.ix)
    assert np.all(grid >= 0.0) and np.isfinite(grid).all()
    # the trained model has skill on the synthetic wave: residuals well
    # below the 3 K wave amplitude
    assert 0.0 < ol_rms < 2.0, ol_rms
    # open_loop predictions must agree with stepwise step() calls
    spw = om.steps_per_week
    gv_w = weekly_ocean_inputs(gv, spw, L)
    x = jnp.zeros((om.ol.R, om.params.n), jnp.float32)
    _, outs = om.open_loop(gv_w[:5])
    x2 = jnp.zeros((om.ol.R, om.params.n), jnp.float32)
    for t in range(5):
        x2, o = om.step(x2, gv_w[t])
    np.testing.assert_allclose(np.asarray(outs[4]), np.asarray(o),
                               rtol=1e-5, atol=1e-5)
    # gated composition: deviations bounded by 3*sigma_resid pointwise
    clim = np.full((L.il, L.ix), 290.0)
    pred = np.full((om.ol.R, om.ol.n_out), 296.0)   # +6 K everywhere
    out = om.compose_sst(pred, clim, L)
    lim = np.minimum(rcfg.slab_anom_clip, np.maximum(3.0 * grid, 0.05))
    assert np.all(np.abs(out - clim) <= lim + 1e-9)


def test_runner_with_ocean():
    """HybridRunner steps the ocean reservoir every steps_per_week and the
    SST feedback changes after the first week boundary."""
    L = _small_layout()
    rcfg = _ocean_rcfg()
    T = 600
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, T, seed=22)
    gv = transform_and_pack(L, atmo, logp, precip, sst, tisr,
                            rcfg.precip_epsilon)
    hm = train_hybrid(L, rcfg, gv, None, seed=9)
    om = train_ocean(L, rcfg, gv, seed=6)

    x = hm.synchronize(gv[-40:])
    s = L.gv_sizes
    last = gv[-1]
    atmo0 = last[s["atmo3d"][0]:s["atmo3d"][1]].reshape(4, L.kx, L.il, L.ix)
    logp0 = last[s["logp"][0]:s["logp"][1]].reshape(L.il, L.ix)
    pr0 = last[s["precip"][0]:s["precip"][1]].reshape(L.il, L.ix)
    sst_last = last[s["sst"][0]:s["sst"][1]].reshape(L.il, L.ix)

    class _R(HybridRunner):
        def _sst_tisr(self, date):
            return sst_last.copy(), np.zeros((L.il, L.ix))

    runner = _R(hm, None, clim=object(), dy=object())
    from speedyml.core.calendar import ModelDate
    # sst_anom0 is an ANOMALY vs climatology (zero = start on climatology,
    # which the stub pins to sst_last)
    out = runner.run(x, atmo0, logp0, pr0, ModelDate(1999, 1, 1, 0),
                     n_steps=10, ocean=om, sst_anom0=np.zeros_like(sst_last))
    assert out["sst"].shape[0] == 10
    # first 4 steps ride the climatology; after the week boundary the ocean
    # prediction's anomaly changes SST over active regions
    np.testing.assert_allclose(out["sst"][0], sst_last, atol=1e-6)
    assert not np.allclose(out["sst"][5], sst_last)
    assert out["x_ocean"] is not None
    assert np.isfinite(out["atmo"]).all()


def test_runner_ocean_excludes_sst_fn():
    """Interactive ocean + observed-SST override double-count anomalies;
    run() must refuse the combination."""
    import pytest
    L = _small_layout()
    rcfg = _ocean_rcfg()
    T = 600
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, T, seed=23)
    gv = transform_and_pack(L, atmo, logp, precip, sst, tisr,
                            rcfg.precip_epsilon)
    hm = train_hybrid(L, rcfg, gv, None, seed=9)
    om = train_ocean(L, rcfg, gv, seed=6)
    x = hm.synchronize(gv[-20:])
    s = L.gv_sizes
    last = gv[-1]
    atmo0 = last[s["atmo3d"][0]:s["atmo3d"][1]].reshape(4, L.kx, L.il, L.ix)
    logp0 = last[s["logp"][0]:s["logp"][1]].reshape(L.il, L.ix)
    pr0 = last[s["precip"][0]:s["precip"][1]].reshape(L.il, L.ix)
    sst_last = last[s["sst"][0]:s["sst"][1]].reshape(L.il, L.ix)

    class _R(HybridRunner):
        def _sst_tisr(self, date):
            return sst_last.copy(), np.zeros((L.il, L.ix))

    runner = _R(hm, None, clim=object(), dy=object())
    from speedyml.core.calendar import ModelDate
    with pytest.raises(AssertionError, match="mutually"):
        runner.run(x, atmo0, logp0, pr0, ModelDate(1999, 1, 1, 0),
                   n_steps=2, ocean=om, sst_fn=lambda d: sst_last)


def test_compose_sst_preserves_ice_blended_boundary():
    """REGRESSION (r3 coupled abort): the boundary field fed to compose_sst
    is the ICE-BLENDED sst_am (sst + sice*(tice - sst), cpl_sea.f90:38-44 /
    cpl_sea_model.f90), which legitimately reaches ~237 K over sea ice.
    An earlier round floored it at the open-water freezing point (271 K),
    jumping polar SST +34 K at the first ocean step and destabilizing the
    coupled run. Pin that (a) compose_sst leaves a ~237 K climatology
    untouched outside active regions, and (b) a week of anomaly-persistence
    feedback through HybridRunner keeps riding the cold climatology."""
    L = _small_layout()
    rcfg = _ocean_rcfg()
    T = 600
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, T, seed=31)
    gv = transform_and_pack(L, atmo, logp, precip, sst, tisr,
                            rcfg.precip_epsilon)
    om = train_ocean(L, rcfg, gv, seed=7)

    # polar-like ice-blended climatology: deep cold rows + open water
    clim = np.full((L.il, L.ix), 290.0)
    clim[:2] = 237.0                       # ice-blended sea-ice rows
    frozen = ~om.active
    if frozen.any():
        # (a) inactive regions pass through bit-exactly — no 271 K floor
        grid = om.compose_sst(np.zeros((om.ol.R, om.ol.n_out)), clim, L)
        ncore = L.resy * L.resx
        g_ss0 = L.gv_sizes["sst"][0]
        tgt = om.ol.target_index[:, :ncore] - g_ss0
        passthrough = grid.reshape(-1)[tgt[frozen].reshape(-1)]
        np.testing.assert_array_equal(
            passthrough, clim.reshape(-1)[tgt[frozen].reshape(-1)])
    # active predictions near clim stay gated near clim, never floored up
    pred = np.full((om.ol.R, om.ol.n_out), 238.0)
    grid = om.compose_sst(pred, clim, L)
    assert grid.min() < 271.0, "cold ice-blended SST must survive"
    assert np.all(grid >= 200.0) and np.all(grid <= 306.0)
    assert np.all(np.abs(grid - clim) <= rcfg.slab_anom_clip + 1e-9)

    # (b) one week of feedback through the runner on the cold climatology
    hm = train_hybrid(L, rcfg, gv, None, seed=9)
    x = hm.synchronize(gv[-20:])
    s = L.gv_sizes
    last = gv[-1]
    atmo0 = last[s["atmo3d"][0]:s["atmo3d"][1]].reshape(4, L.kx, L.il, L.ix)
    logp0 = last[s["logp"][0]:s["logp"][1]].reshape(L.il, L.ix)
    pr0 = last[s["precip"][0]:s["precip"][1]].reshape(L.il, L.ix)

    class _R(HybridRunner):
        def _sst_tisr(self, date):
            return clim.copy(), np.zeros((L.il, L.ix))

    runner = _R(hm, None, clim=object(), dy=object())
    from speedyml.core.calendar import ModelDate
    out = runner.run(x, atmo0, logp0, pr0, ModelDate(1999, 1, 1, 0),
                     n_steps=9, ocean=om,
                     sst_anom0=np.zeros_like(clim))
    # across the week boundary the fed-back SST stays anomaly-bounded
    # around the COLD climatology: the ice rows never jump to >= 271 K
    for k in range(9):
        assert np.all(np.abs(out["sst"][k] - clim)
                      <= rcfg.slab_anom_clip + 1e-6), k
    assert out["sst"][:, :2].max() <= 237.0 + rcfg.slab_anom_clip + 1e-6
