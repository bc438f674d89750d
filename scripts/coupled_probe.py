"""Coupled-instability probe: isolate WHAT blows up at the first weekly
ocean feedback (both r4 smokes jump to near-identical T fields at step 28
despite 3x different SST anomaly magnitudes — suspicious of a structural
bug rather than SST physics).

Runs, with one model load:
  A. uncoupled fastloop, 3 chunks          (chunk-boundary control)
  B. coupled, gate scaled to ~0 (0.05 K)   (ocean branch, no real anomaly)
  C. coupled, calibrated gate              (the production config)
  D. per-step HybridRunner coupled, 32 steps (cross-check the loop impl)

Usage: python scripts/coupled_probe.py [--skip D]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:7.1f}s] {m}", flush=True)


def tmax_series(out):
    a = out["atmo"]
    if a is None or len(a) == 0:
        return []
    return [round(float(a[i, 0].max()), 2) for i in range(0, len(a), 4)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    ap.add_argument("--cache", default="data/refscale.npz")
    ap.add_argument("--weights", default="data/refscale_weights.nc")
    ap.add_argument("--holdout", type=int, default=124)
    args = ap.parse_args()

    import jax.numpy as jnp
    from speedyml.core.calendar import ModelDate, datetime_from_hours
    from speedyml.core.config import ModelConfig, ReservoirConfig
    from speedyml.hybrid.experiment import (HybridRunner, TruthSeries,
                                            transform_and_pack)
    from speedyml.hybrid.fastloop import ScanHybridRunner
    from speedyml.hybrid.forecast import SpeedyForecaster
    from speedyml.io.weights import load_model
    from speedyml.model import Speedy
    from speedyml.reservoir.slab import train_ocean, weekly_ocean_inputs

    z = np.load(args.cache)
    truth = TruthSeries(atmo=z["atmo"], logp=z["logp"], precip=z["precip"],
                        sst=z["sst"], tisr=z["tisr"], hours=z["hours"])
    n_train = truth.atmo.shape[0] - args.holdout
    sp = Speedy(ModelConfig(dtype="float32"))
    radang_deg = np.degrees(np.asarray(sp.dy.tables.radang))
    hm = load_model(args.weights, radang_deg=radang_deg)
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
                        checkpoint_dir=args.cache + ".ocean_ckpt")
    _, ol_rms, p_rms = ocean.calibrate_gate(gv_truth[:n_train], L)
    gate_grid = np.array(ocean.anom_std)
    log(f"ocean ready (open-loop {ol_rms:.3f} K)")

    spw = ocean.steps_per_week
    gv_w = weekly_ocean_inputs(gv_truth[:n_train], spw, L)
    x_ocean0 = ocean.synchronize(gv_w)
    n_sync = hm.rcfg.synclength // hm.rcfg.timestep
    x0 = hm.synchronize(gv_truth[n_train - n_sync:n_train])
    s = L.gv_sizes
    last = gv_truth[n_train - 1]
    atmo0 = last[s["atmo3d"][0]:s["atmo3d"][1]].reshape(4, L.kx, L.il, L.ix)
    logp0 = last[s["logp"][0]:s["logp"][1]].reshape(L.il, L.ix)
    pr0 = last[s["precip"][0]:s["precip"][1]].reshape(L.il, L.ix)
    y, m, d, h = datetime_from_hours(int(truth.hours[n_train - 1]))
    date0 = ModelDate(y, m, d, h)
    log("synchronized")

    results = {}
    fast = ScanHybridRunner(hm, sp, physics=True)

    if "A" not in args.skip:
        out = fast.run(x0, atmo0, logp0, pr0,
                       ModelDate(y, m, d, h), 84)
        results["A_uncoupled"] = dict(aborted=bool(out["aborted"]),
                                      steps=len(out["atmo"]),
                                      tmax=tmax_series(out))
        log(f"A uncoupled: {results['A_uncoupled']}")

    if "B" not in args.skip:
        ocean.anom_std = np.zeros_like(gate_grid)     # gate -> 0.05 K floor
        out = fast.run(x0, atmo0, logp0, pr0, ModelDate(y, m, d, h), 84,
                       ocean=ocean, x_ocean=x_ocean0)
        results["B_gate0"] = dict(aborted=bool(out["aborted"]),
                                  steps=len(out["atmo"]),
                                  tmax=tmax_series(out))
        log(f"B gate~0: {results['B_gate0']}")

    if "C" not in args.skip:
        ocean.anom_std = gate_grid
        out = fast.run(x0, atmo0, logp0, pr0, ModelDate(y, m, d, h), 84,
                       ocean=ocean, x_ocean=x_ocean0)
        results["C_gated"] = dict(aborted=bool(out["aborted"]),
                                  steps=len(out["atmo"]),
                                  tmax=tmax_series(out))
        log(f"C gated: {results['C_gated']}")

    if "D" not in args.skip:
        ocean.anom_std = gate_grid
        fc = SpeedyForecaster(sp, hours=6, physics=True)
        hrun = HybridRunner(hm, fc)
        out = hrun.run(x0, atmo0, logp0, pr0, ModelDate(y, m, d, h), 32,
                       ocean=ocean, x_ocean=x_ocean0)
        results["D_perstep"] = dict(aborted=bool(out["aborted"]),
                                    steps=len(out["atmo"]),
                                    tmax=tmax_series(out))
        log(f"D per-step: {results['D_perstep']}")

    with open("data/coupled_probe.json", "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(results))
    print("PROBE DONE")


if __name__ == "__main__":
    main()
