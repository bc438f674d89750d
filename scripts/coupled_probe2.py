"""Instrumented per-step coupled run: at each step print per-section input
deltas + window/readout output stats to pinpoint WHAT jumps at the first
weekly ocean feedback (step 28) despite |SST anomaly| <= 0.05 K."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def main():
    import jax.numpy as jnp
    from speedyml.core.calendar import ModelDate, datetime_from_hours
    from speedyml.core.config import ModelConfig, ReservoirConfig
    from speedyml.hybrid.experiment import (HybridRunner, TruthSeries,
                                            transform_and_pack, QMIN)
    from speedyml.hybrid.forecast import SpeedyForecaster
    from speedyml.io.weights import load_model
    from speedyml.model import Speedy
    from speedyml.reservoir.slab import (compose_week_inputs, train_ocean,
                                         weekly_ocean_inputs)

    z = np.load("data/refscale.npz")
    truth = TruthSeries(atmo=z["atmo"], logp=z["logp"], precip=z["precip"],
                        sst=z["sst"], tisr=z["tisr"], hours=z["hours"])
    n_train = truth.atmo.shape[0] - 124
    sp = Speedy(ModelConfig(dtype="float32"))
    radang_deg = np.degrees(np.asarray(sp.dy.tables.radang))
    hm = load_model("data/refscale_weights.nc", radang_deg=radang_deg)
    L = hm.layout
    gv_truth = transform_and_pack(L, truth.atmo, truth.logp, truth.precip,
                                  truth.sst, truth.tisr,
                                  hm.rcfg.precip_epsilon)
    log("weights + gv ready")

    orcfg = ReservoirConfig(slab_nodes=500, slab_beta_res=3e-3,
                            discardlength=hm.rcfg.discardlength,
                            timestep_slab=168)
    ocean = train_ocean(L, orcfg, gv_truth[:n_train], seed=100,
                        region_block=64, solver="device",
                        checkpoint_dir="data/refscale.npz.ocean_ckpt")
    ocean.anom_std = np.zeros((L.il, L.ix))      # gate -> 0.05 K floor
    spw = ocean.steps_per_week
    gv_w = weekly_ocean_inputs(gv_truth[:n_train], spw, L)
    x_ocean = ocean.synchronize(gv_w)
    n_sync = hm.rcfg.synclength // hm.rcfg.timestep
    x = hm.synchronize(gv_truth[n_train - n_sync:n_train])
    s = L.gv_sizes
    last = gv_truth[n_train - 1]
    atmo = jnp.asarray(last[s["atmo3d"][0]:s["atmo3d"][1]].reshape(
        4, L.kx, L.il, L.ix))
    logp = jnp.asarray(last[s["logp"][0]:s["logp"][1]].reshape(L.il, L.ix))
    pr_t = jnp.asarray(last[s["precip"][0]:s["precip"][1]].reshape(
        L.il, L.ix))
    y, m, d, h = datetime_from_hours(int(truth.hours[n_train - 1]))
    date = ModelDate(y, m, d, h)
    log("synchronized")

    fc = SpeedyForecaster(sp, hours=6, physics=True)
    runner = HybridRunner(hm, fc)
    gv_sum, n_accum = None, 0
    sst_anom = None
    gv_prev = None

    def sec_stats(v, vp):
        out = {}
        for name, (a, b) in s.items():
            if b > a:
                out[name] = round(float(np.abs(v[a:b] - vp[a:b]).max()), 3)
        return out

    for i in range(32):
        sst, tisr = runner._sst_tisr(date)
        if sst_anom is not None:
            sst = np.clip(sst + sst_anom, 200.0, 306.0)
        gv = runner._pack(atmo, logp, pr_t, sst, tisr)
        gv_h = np.asarray(gv)
        if ocean is not None:
            gv_sum = gv if gv_sum is None else gv_sum + gv
            n_accum += 1
            if n_accum == spw:
                gv_week = compose_week_inputs(gv, gv_sum, spw, L)
                x_ocean, sst_core = ocean.step(x_ocean, gv_week)
                clim_sst, _ = runner._sst_tisr(date)
                grid = ocean.compose_sst(np.asarray(sst_core), clim_sst, L)
                sst_anom = grid - clim_sst
                log(f"  OCEAN step at i={i}: |anom| max "
                    f"{np.abs(sst_anom).max():.4f}, sst_core range "
                    f"[{np.asarray(sst_core).min():.1f}, "
                    f"{np.asarray(sst_core).max():.1f}]")
                gv_sum, n_accum = None, 0
        gs = runner.fc  # noqa
        from speedyml.hybrid.experiment import _atmo_to_grid
        gsx = _atmo_to_grid(atmo, logp)
        res = fc.forecast(gsx, date, sst_hybrid=sst)
        f_atmo = jnp.stack([res.gs.t, res.gs.u, res.gs.v,
                            jnp.maximum(res.gs.q, QMIN)])
        f_pr = jnp.log1p(jnp.maximum(res.precip_mm, 0.0) / runner.eps)
        model_gv = runner._pack(f_atmo, res.gs.logp, f_pr, sst, tisr)
        x, atmo, logp, pr_t = hm.step(x, gv, model_gv)
        date.advance_hours(hm.rcfg.timestep)
        a_h = np.asarray(atmo)
        mg_h = np.asarray(model_gv)
        wTmax = float(np.asarray(res.gs.t).max())
        msg = (f"i={i:2d} safe={bool(res.safe)} winTmax={wTmax:7.2f} "
               f"outTmax={a_h[0].max():7.2f} outTmin={a_h[0].min():7.2f} "
               f"qmax={a_h[3].max():6.2f}")
        if gv_prev is not None and i >= 25:
            msg += f" dgv={sec_stats(gv_h, gv_prev)}"
        log(msg)
        gv_prev = gv_h
    print("PROBE2 DONE")


if __name__ == "__main__":
    main()
