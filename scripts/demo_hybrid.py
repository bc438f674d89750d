"""End-to-end hybrid demo at T30L8: self-generated truth -> train -> predict.

Small-scale settings (short training, minimal reservoirs) so it runs in
minutes on CPU; the same code path scales to production settings on TPU.

Usage: python scripts/demo_hybrid.py [--samples N] [--fc-steps N]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=48,
                    help="training samples (6-hourly)")
    ap.add_argument("--fc-steps", type=int, default=4)
    ap.add_argument("--spinup-days", type=int, default=5)
    ap.add_argument("--region-block", type=int, default=192)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--discard", type=int, default=24,
                    help="discard length in hours (reference: 240)")
    ap.add_argument("--prior", type=float, default=0.0)
    ap.add_argument("--beta-res", type=float, default=1e-3)
    ap.add_argument("--skip-ml-only", action="store_true")
    args = ap.parse_args()

    import jax
    from speedyml.core.config import ModelConfig, ReservoirConfig
    from speedyml.domain.decomposition import build_layout
    from speedyml.hybrid.experiment import (HybridRunner, collect_forecasts,
                                            collect_truth, train_hybrid,
                                            transform_and_pack)
    from speedyml.hybrid.forecast import SpeedyForecaster, TrajectoryRunner
    from speedyml.model import Speedy

    t0 = time.time()
    cfg = ModelConfig(dtype=args.dtype)
    sp = Speedy(cfg)
    print(f"[{time.time()-t0:6.1f}s] model built", flush=True)

    runner = TrajectoryRunner(sp)
    runner.initialize(year=1982, month=1, spinup_days=args.spinup_days)
    print(f"[{time.time()-t0:6.1f}s] spin-up done", flush=True)

    truth = collect_truth(runner, args.samples)
    print(f"[{time.time()-t0:6.1f}s] truth collected: "
          f"{truth.atmo.shape}", flush=True)

    # imperfect model: the DRY core (all physics off) — large, honest model
    # error for the reservoirs to correct
    fc_imperfect = SpeedyForecaster(sp, hours=6, physics=False)
    m_atmo, m_logp, m_precip = collect_forecasts(fc_imperfect, truth)
    print(f"[{time.time()-t0:6.1f}s] imperfect-model forecasts done",
          flush=True)

    rcfg = ReservoirConfig(nodes_per_input=576, degree=6, noise_std=0.05,
                           discardlength=args.discard, synclength=48,
                           prior_val=args.prior, beta_res=args.beta_res)
    L = build_layout(radang_deg=np.degrees(np.asarray(sp.dy.tables.radang)))
    gv_truth = transform_and_pack(L, truth.atmo, truth.logp, truth.precip,
                                  truth.sst, truth.tisr, rcfg.precip_epsilon)
    gv_model = transform_and_pack(L, m_atmo, m_logp, m_precip,
                                  truth.sst, truth.tisr, rcfg.precip_epsilon)

    hm = train_hybrid(L, rcfg, gv_truth, gv_model, seed=0,
                      region_block=args.region_block)
    print(f"[{time.time()-t0:6.1f}s] hybrid training done "
          f"(wout {hm.params.wout.shape})", flush=True)

    # sync on the last samples, forecast beyond the training set
    n_sync = rcfg.synclength // rcfg.timestep
    x = hm.synchronize(gv_truth[-n_sync:])
    s = L.gv_sizes
    last = gv_truth[-1]
    atmo0 = last[s["atmo3d"][0]:s["atmo3d"][1]].reshape(4, L.kx, L.il, L.ix)
    logp0 = last[s["logp"][0]:s["logp"][1]].reshape(L.il, L.ix)
    pr0 = last[s["precip"][0]:s["precip"][1]].reshape(L.il, L.ix)

    fc_speedy = SpeedyForecaster(sp, hours=6, physics=True)
    hrun = HybridRunner(hm, fc_speedy)
    out = hrun.run(x, atmo0, logp0, pr0, runner.date, args.fc_steps)
    print(f"[{time.time()-t0:6.1f}s] hybrid forecast: aborted={out['aborted']}"
          f" steps={0 if out['atmo'] is None else len(out['atmo'])}",
          flush=True)
    a = out["atmo"]
    assert a is not None and np.all(np.isfinite(a)), "non-finite forecast"
    print("  T range:", a[:, 0].min(), a[:, 0].max())
    print("  u range:", a[:, 1].min(), a[:, 1].max())
    print("  q range:", a[:, 3].min(), a[:, 3].max())
    # persistence comparison over the forecast window: continue truth
    truth2 = collect_truth(runner, args.fc_steps)
    rms_hyb = [float(np.sqrt(np.mean((a[i, 0] - truth2.atmo[i, 0]) ** 2)))
               for i in range(args.fc_steps)]
    rms_per = [float(np.sqrt(np.mean((truth.atmo[-1, 0] -
                                      truth2.atmo[i, 0]) ** 2)))
               for i in range(args.fc_steps)]
    print("  T RMS hybrid     :", [f"{r:.3f}" for r in rms_hyb])
    print("  T RMS persistence:", [f"{r:.3f}" for r in rms_per])

    # ml-only from the same start
    if args.skip_ml_only:
        print("DEMO OK")
        return
    hm_ml = train_hybrid(L, rcfg, gv_truth, None, seed=0,
                         region_block=args.region_block)
    x_ml = hm_ml.synchronize(gv_truth[-n_sync:])
    hrun_ml = HybridRunner(hm_ml, fc_speedy)
    out_ml = hrun_ml.run(x_ml, atmo0, logp0, pr0, out["date"], args.fc_steps)
    a_ml = out_ml["atmo"]
    assert a_ml is not None and np.all(np.isfinite(a_ml))
    print(f"[{time.time()-t0:6.1f}s] ml-only forecast ok; "
          f"T range {a_ml[:, 0].min():.1f}..{a_ml[:, 0].max():.1f}",
          flush=True)
    print("DEMO OK")


if __name__ == "__main__":
    main()
