"""Diagnostic: separate plumbing error from data starvation in the hybrid fit.

Trains on synthetic SPEEDY truth, then reports:
  a) the imperfect (dry) model's own one-window error,
  b) in-sample teacher-forced readout error,
  c) out-of-sample teacher-forced readout error,
all in standardized units and in T[K] RMS, plus the same with prior_val=1.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from speedyml.core.config import ModelConfig, ReservoirConfig
    from speedyml.domain.decomposition import build_layout
    from speedyml.hybrid.experiment import (collect_forecasts, collect_truth,
                                            train_hybrid, transform_and_pack)
    from speedyml.hybrid.forecast import SpeedyForecaster, TrajectoryRunner
    from speedyml.model import Speedy

    samples = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    t0 = time.time()
    sp = Speedy(ModelConfig(dtype="float32"))
    runner = TrajectoryRunner(sp)
    runner.initialize(year=1982, month=1, spinup_days=5)
    truth = collect_truth(runner, samples)
    fc = SpeedyForecaster(sp, hours=6, physics=False)
    m_atmo, m_logp, m_precip = collect_forecasts(fc, truth)
    print(f"[{time.time()-t0:.0f}s] data ready")

    # dry-model one-window error in T
    terr = np.sqrt(np.mean((m_atmo[1:, 0] - truth.atmo[1:, 0]) ** 2))
    print(f"dry model 6h T RMS error: {terr:.3f} K")
    perr = np.sqrt(np.mean((truth.atmo[:-1, 0] - truth.atmo[1:, 0]) ** 2))
    print(f"persistence 6h T RMS    : {perr:.3f} K")

    L = build_layout(radang_deg=np.degrees(np.asarray(sp.dy.tables.radang)))
    for pv, br in ((0.0, 1e-3), (1.0, 1e-3), (1.0, 1.0)):
        rcfg = ReservoirConfig(nodes_per_input=576, degree=6, noise_std=0.05,
                               discardlength=24, synclength=48,
                               prior_val=pv, beta_res=br)
        gv_t = transform_and_pack(L, truth.atmo, truth.logp, truth.precip,
                                  truth.sst, truth.tisr, rcfg.precip_epsilon)
        gv_m = transform_and_pack(L, m_atmo, m_logp, m_precip,
                                  truth.sst, truth.tisr, rcfg.precip_epsilon)
        n_test = 16
        hm = train_hybrid(L, rcfg, gv_t[:-n_test], gv_m[:-n_test], seed=0,
                          region_block=192)
        print(f"[{time.time()-t0:.0f}s] trained prior={pv} beta_res={br}")

        # teacher-forced one-step errors, out of sample
        x = hm.synchronize(gv_t[-n_test - 10:-n_test])
        errs_T = []
        from speedyml.domain.decomposition import scatter_outputs
        for k in range(n_test - 1):
            i = len(gv_t) - n_test + k
            x, atmo, logp, pr = hm.step(x, jnp.asarray(gv_t[i]),
                                        jnp.asarray(gv_m[i + 1]))
            true_T = truth.atmo[i + 1, 0]
            errs_T.append(float(np.sqrt(np.mean(
                (np.asarray(atmo)[0] - true_T) ** 2))))
        print("  teacher-forced oos T RMS:",
              [f"{e:.3f}" for e in errs_T[:6]], "mean",
              f"{np.mean(errs_T):.3f}")


if __name__ == "__main__":
    main()
