"""Benchmark: T30L8 throughput per chip.

Prints ONE JSON line. Primary metric (BASELINE.json north star): grid-points
per second per chip of the FULL HYBRID STEP — reference-scale batched ESN
prediction (1152 regions, n=5760 nodes, wout 1152x136x5896) + the 6-hour
SPEEDY window with full physics + pack/standardize/scatter — the production
inner loop (mpires.f90:218-804 + mod_reservoir.f90:1418-1489 combined).
When trained weights exist (data/refscale_weights.nc) the step runs them
with the real standardizer and a live precip feedback loop; otherwise
random weights at identical shapes/sparsity time the same program.

Secondary metrics: ensemble-batched hybrid step (the climate-ensemble
mode: the whole step vmapped over E members — amortizes the wout HBM
stream and batches the window), dry-core ensemble figures (f32/bf16), and
a reference-scale training-block timing (state loop + compensated
accumulation + on-device f64 ridge solve per 8-region block; x64
subprocess).

vs_baseline compares against BENCH_BASELINE.json — NOTE: that file holds
THIS framework's own round-1/2 measurements (the reference publishes no
throughput numbers, BASELINE.md), so vs_baseline tracks self-improvement.

NOTE (measurement): on remote-tunnel backends (axon) `block_until_ready`
returns before device execution finishes; the only true synchronization is
a device->host transfer, which this bench uses (BASELINE.md, round 1).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

WEIGHTS_PATH = "data/refscale_weights.nc"


def _sync(arr):
    np.asarray(arr.ravel()[0])       # true host sync on remote backends


def bench_dry_core(cfg_dtype="float32", grid_compute="float32",
                   ens_list=(64, 128), nsteps_chunk=96, nchunks=4):
    import jax
    import jax.numpy as jnp

    from speedyml.core.config import ModelConfig
    from speedyml.dynamics.core import Dycore
    from speedyml.dynamics.initial import rest_state
    from speedyml.io.boundary import BoundaryData

    try:
        orog = BoundaryData("/root/reference/bin").orog
    except Exception:
        orog = None

    cfg = ModelConfig(dtype=cfg_dtype, grid_compute=grid_compute)
    dy = Dycore(cfg, orog=orog)
    state0 = dy.stepone(rest_state(dy), dy.zero_forcing())
    forcing = dy.zero_forcing()
    gp = cfg.ix * cfg.il * cfg.kx

    def measure(ens):
        def step_one(s):
            return dy.step(s, forcing, 1, 1, "delt2")

        def run_chunk(s):
            def body(ss, _):
                return jax.vmap(step_one)(ss), None
            s, _ = jax.lax.scan(body, s, None, length=nsteps_chunk)
            return s

        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (ens,) + x.shape) + 0.0,
            state0)
        run = jax.jit(run_chunk)
        state = run(state)
        _sync(state.ps)
        t0 = time.perf_counter()
        for _ in range(nchunks):
            state = run(state)
        _sync(state.ps)
        dt = time.perf_counter() - t0
        return ens * nsteps_chunk * nchunks * gp / dt

    best, best_ens = 0.0, 0
    for ens in ens_list:
        gps = measure(ens)
        if gps > best:
            best, best_ens = gps, ens
    return best, best_ens


def _random_hm(L, rcfg, m=6000, deg=6):
    """HybridModel with random reference-scale parameters + identity stats
    (timing-only: real shapes, sparsity, and production circulant topology)."""
    import jax.numpy as jnp

    from speedyml.domain.standardize import Standardizer
    from speedyml.hybrid.experiment import HybridModel
    from speedyml.reservoir.esn import EsnParams
    from speedyml.reservoir.generate import ring_shifts

    R, n_in, n_out = L.R, L.n_in, L.n_out
    n = (m // n_in) * n_in
    rng = np.random.default_rng(0)
    na = n + n_out
    shifts = ring_shifts(n, deg)
    a_idx = ((np.arange(n, dtype=np.int64)[None, :, None] + shifts) % n)
    params = EsnParams(
        a_idx=jnp.asarray(np.broadcast_to(a_idx, (R, n, deg)), jnp.int32),
        a_val=jnp.asarray(rng.normal(size=(R, n, deg)) * 0.05, jnp.float32),
        win=jnp.asarray(rng.uniform(-0.5, 0.5, size=(R, n)), jnp.float32),
        wout=jnp.asarray(rng.normal(size=(R, n_out, na)) * 1e-3, jnp.float32),
        node_map=jnp.asarray(np.arange(n) // (n // n_in), jnp.int32),
        leakage=1.0,
        a_shift=jnp.asarray(shifts))
    stz = Standardizer(
        in_mean=jnp.zeros((R, n_in), jnp.float32),
        in_std=jnp.ones((R, n_in), jnp.float32),
        out_mean=jnp.zeros((R, n_out), jnp.float32),
        out_std=jnp.ones((R, n_out), jnp.float32))
    return HybridModel(layout=L, params=params, stz=stz, rcfg=rcfg,
                       ml_only=False)


_CACHE = {}


def _speedy_and_hm(grid_compute="float32", force_random=False):
    """Build (speedy, hm, gs0): trained weights when available."""
    import jax

    from speedyml.core.config import ModelConfig, ReservoirConfig
    from speedyml.domain.decomposition import build_layout
    from speedyml.hybrid.state_io import extract
    from speedyml.model import Speedy

    cfg = ModelConfig(dtype="float32", grid_compute=grid_compute)
    sp = Speedy(cfg)
    sp.initialize(year=1982, month=1)
    sp.run_days(2)                       # non-trivial state
    gs0 = jax.tree.map(jax.numpy.asarray, extract(sp.dy, sp.state, level=0))

    key = "hm_random" if force_random else "hm"
    if key not in _CACHE:
        radang_deg = np.degrees(np.asarray(sp.dy.tables.radang))
        trained = False
        hm = None
        if not force_random and os.path.exists(WEIGHTS_PATH):
            try:
                from speedyml.io.weights import load_model
                hm = load_model(WEIGHTS_PATH, radang_deg=radang_deg)
                trained = not hm.ml_only
            except Exception as e:
                print(f"# weights load failed ({e!r}); random params",
                      file=sys.stderr)
        if hm is None or hm.ml_only:
            L = build_layout(radang_deg=radang_deg)
            hm = _random_hm(L, ReservoirConfig())
        _CACHE[key] = (hm, trained)
    return sp, _CACHE[key][0], _CACHE[key][1], gs0


def bench_hybrid_step(n_steps=16, grid_compute="float32",
                      wout_dtype="float32", force_random=False,
                      r2_program=False):
    """Full hybrid step, single trajectory (the reference's operating mode,
    parallelmain.f90:206-273): window + pack + standardize + ESN + scatter,
    with live precip feedback into the next step's supervector."""
    import jax
    import jax.numpy as jnp

    from speedyml.domain.decomposition import pack_global, scatter_outputs
    from speedyml.domain.standardize import (standardize_in, standardize_out,
                                             unstandardize_out)
    from speedyml.hybrid.forecast import SpeedyForecaster
    from speedyml.hybrid.state_io import GridState
    from speedyml.reservoir.esn import predict_step

    sp, hm, trained, gs0 = _speedy_and_hm(grid_compute, force_random)
    L = hm.layout
    cfg = sp.config
    params = hm.params
    stz = hm.stz
    if r2_program:
        # the r2 bench variant (regression attribution): identity stats +
        # zero precip input every step (no live feedback)
        import jax.numpy as _jnp
        from speedyml.domain.standardize import Standardizer as _Stz
        stz = _Stz(in_mean=_jnp.zeros((L.R, L.n_in), _jnp.float32),
                   in_std=_jnp.ones((L.R, L.n_in), _jnp.float32),
                   out_mean=_jnp.zeros((L.R, L.n_out), _jnp.float32),
                   out_std=_jnp.ones((L.R, L.n_out), _jnp.float32))
    if wout_dtype != "float32":
        from speedyml.reservoir.esn import cast_wout
        params = cast_wout(params, jnp.dtype(wout_dtype))
    eps = hm.rcfg.precip_epsilon

    fc = SpeedyForecaster(sp, hours=6, physics=True)
    surf, forcing, _, _ = fc._surf_forcing(sp.date)
    win_fn = fc._window_fn()
    idx = jnp.asarray(L.input_index)
    tidx = jnp.asarray(L.target_index)

    @jax.jit
    def hybrid_step(params, stz, x, gs, precip_t, surf, forcing, sst, tisr):
        res = win_fn(gs, surf, forcing)
        f_atmo = jnp.stack([res.gs.t, res.gs.u, res.gs.v,
                            jnp.maximum(res.gs.q, 1e-6)])
        f_pr = jnp.log1p(jnp.maximum(res.precip_mm, 0.0) / eps)
        model_gv = pack_global(L, f_atmo, res.gs.logp, f_pr, sst, tisr)
        atmo = jnp.stack([gs.t, gs.u, gs.v, jnp.maximum(gs.q, 1e-6)])
        gv = pack_global(L, atmo, gs.logp, precip_t, sst, tisr)
        u = standardize_in(stz, gv[idx])
        mv = standardize_out(stz, model_gv[tidx])
        x, out_std = predict_step(params, x, u, mv)
        out = unstandardize_out(stz, out_std)
        a2, logp2, pr2 = scatter_outputs(L, out)
        gs2 = GridState(t=a2[0], u=a2[1], v=a2[2],
                        q=jnp.maximum(a2[3], 1e-6), logp=logp2)
        return x, gs2, jnp.maximum(pr2, 0.0)

    sst = jnp.asarray(np.asarray(sp.coupler.sst_am), jnp.float32)
    tisr = jnp.asarray(np.full((cfg.il, cfg.ix), 300.0), jnp.float32)
    x = jnp.zeros((L.R, params.win.shape[1]), jnp.float32)
    pr_t = jnp.zeros((cfg.il, cfg.ix), jnp.float32)

    zero_pr = jnp.zeros((cfg.il, cfg.ix), jnp.float32)
    x, gs, pr_t = hybrid_step(params, stz, x, gs0, pr_t, surf, forcing,
                              sst, tisr)
    _sync(gs.t)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        x, gs, pr_t = hybrid_step(params, stz, x, gs,
                                  zero_pr if r2_program else pr_t, surf,
                                  forcing, sst, tisr)
    _sync(gs.t)
    dt = time.perf_counter() - t0
    gp = cfg.ix * cfg.il * cfg.kx
    return n_steps * gp / dt, dt / n_steps, trained


def bench_hybrid_ensemble(ens_list=(16, 32, 64, 96, 128), n_steps=4,
                          grid_compute="bfloat16", wout_dtype="float32",
                          attribution=True):
    """Ensemble-batched hybrid step (hybrid/ensemble.py): the full step
    vmapped over E members; value = E * gridpoints * steps / s.
    Sweeps E until HBM runs out (the x_e state alone is E*1152*5760 f32 =
    26.5 MB/member; large E plus the 3.7 GB f32 wout exceeds the 16 GB
    chip — wout_dtype='bfloat16' halves the resident bank AND the readout
    stream, extending the feasible sweep) and reports the full sweep for
    saturation analysis."""
    import jax.numpy as jnp

    from speedyml.hybrid.ensemble import EnsembleHybrid
    from speedyml.hybrid.forecast import SpeedyForecaster

    sp, hm, trained, gs0 = _speedy_and_hm(grid_compute)
    if wout_dtype != "float32":
        import dataclasses as _dc
        from speedyml.reservoir.esn import cast_wout
        hm = _dc.replace(hm, params=cast_wout(hm.params,
                                              jnp.dtype(wout_dtype)))
    cfg = sp.config
    fc = SpeedyForecaster(sp, hours=6, physics=True)
    surf, forcing, _, _ = fc._surf_forcing(sp.date)
    eh = EnsembleHybrid(hm, fc)
    sst = np.asarray(sp.coupler.sst_am, np.float32)
    tisr = np.full((cfg.il, cfg.ix), 300.0, np.float32)
    gp = cfg.ix * cfg.il * cfg.kx
    rng = np.random.default_rng(1)

    best, best_E = 0.0, 0
    sweep = {}
    for E in ens_list:
        try:
            atmo = np.stack([np.asarray(gs0.t), np.asarray(gs0.u),
                             np.asarray(gs0.v),
                             np.maximum(np.asarray(gs0.q), 1e-6)])
            atmo_e = (atmo[None] + 0.01 * rng.normal(
                size=(E,) + atmo.shape)).astype(np.float32)
            logp_e = np.broadcast_to(np.asarray(gs0.logp),
                                     (E,) + gs0.logp.shape
                                     ).astype(np.float32).copy()
            pr_e = np.zeros_like(logp_e)
            x_e = jnp.zeros((E, hm.layout.R, hm.params.win.shape[1]),
                            jnp.float32)
            out = eh.step(x_e, atmo_e, logp_e, pr_e, sst, tisr, surf,
                          forcing)
            _sync(out[1])
            t0 = time.perf_counter()
            x_e, a_e, l_e, p_e = out[0], out[1], out[2], out[3]
            for _ in range(n_steps):
                x_e, a_e, l_e, p_e, _safe = eh.step(x_e, a_e, l_e, p_e, sst,
                                                    tisr, surf, forcing)
            _sync(a_e)
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"# ensemble E={E} failed ({type(e).__name__}); "
                  f"sweep stops", file=sys.stderr)
            break
        gps = E * n_steps * gp / dt
        sweep[str(E)] = round(gps, 1)
        if gps > best:
            best, best_E = gps, E
    if best_E and attribution:
        # component attribution at the best E (VERDICT r3: where the
        # ensemble step saturates): vmapped SPEEDY window alone vs the
        # ESN exchange alone (pack + standardize + advance/readout +
        # scatter, weights broadcast across members like EnsembleHybrid)
        try:
            import jax
            from speedyml.domain.decomposition import (pack_global,
                                                       scatter_outputs)
            from speedyml.domain.standardize import (standardize_in,
                                                     standardize_out,
                                                     unstandardize_out)
            from speedyml.hybrid.state_io import GridState
            from speedyml.reservoir.esn import predict_step
            L = hm.layout
            idx = jnp.asarray(L.input_index)
            tidx = jnp.asarray(L.target_index)
            win = fc._window_fn()
            E = best_E
            atmo = np.stack([np.asarray(gs0.t), np.asarray(gs0.u),
                             np.asarray(gs0.v),
                             np.maximum(np.asarray(gs0.q), 1e-6)])
            atmo_e = jnp.asarray((atmo[None] + 0.01 * rng.normal(
                size=(E,) + atmo.shape)).astype(np.float32))
            logp_e = jnp.asarray(np.broadcast_to(
                np.asarray(gs0.logp), (E,) + gs0.logp.shape
            ).astype(np.float32))
            pr_e = jnp.zeros_like(logp_e)
            ssj, tij = jnp.asarray(sst), jnp.asarray(tisr)

            def _win_member(a, lp):
                gs = GridState(t=a[0], u=a[1], v=a[2],
                               q=jnp.maximum(a[3], 1e-6), logp=lp)
                r = win(gs, surf, forcing)
                return r.gs.t

            win_e = jax.jit(jax.vmap(_win_member))
            _sync(win_e(atmo_e, logp_e))
            t0 = time.perf_counter()
            for _ in range(n_steps):
                _w = win_e(atmo_e, logp_e)
            _sync(_w)
            dt_w = (time.perf_counter() - t0) / n_steps

            params, stz = hm.params, hm.stz

            def _esn_member(x, a, lp, pt):
                gv = pack_global(L, a, lp, pt, ssj, tij)
                u = standardize_in(stz, gv[idx])
                mv = standardize_out(stz, gv[tidx])
                x, out_std = predict_step(params, x, u, mv)
                out = unstandardize_out(stz, out_std)
                a2, lp2, pr2 = scatter_outputs(L, out)
                return x, a2
            esn_e = jax.jit(jax.vmap(_esn_member))
            x_e = jnp.zeros((E, L.R, params.win.shape[1]), jnp.float32)
            xe, ae = esn_e(x_e, atmo_e, logp_e, pr_e)
            _sync(ae)
            t0 = time.perf_counter()
            for _ in range(n_steps):
                xe, ae = esn_e(xe, atmo_e, logp_e, pr_e)
            _sync(ae)
            dt_e = (time.perf_counter() - t0) / n_steps
            sweep["window_ms_at_best_E"] = round(dt_w * 1e3, 2)
            sweep["esn_ms_at_best_E"] = round(dt_e * 1e3, 2)
        except Exception as e:
            print(f"# ensemble attribution failed: {e!r}", file=sys.stderr)
    return best, best_E, sweep


def bench_fastloop(n_chunks=3, chunk=28):
    """Production chunked prediction loop (hybrid.fastloop): seconds per
    hybrid step of a full-physics K-step scanned chunk, steady state
    (first chunk = compile, excluded). This is the number that describes
    the workload users actually run (VERDICT r3: the per-step loop paid
    13.3 s/step in host round trips)."""
    from speedyml.core.calendar import ModelDate
    from speedyml.hybrid.fastloop import ScanHybridRunner

    sp, hm, trained, gs0 = _speedy_and_hm("float32")
    r = ScanHybridRunner(hm, sp, physics=True, chunk=chunk)
    import jax.numpy as jnp
    atmo = np.stack([np.asarray(gs0.t), np.asarray(gs0.u),
                     np.asarray(gs0.v),
                     np.maximum(np.asarray(gs0.q), 1e-6)]).astype(np.float32)
    logp = np.asarray(gs0.logp, np.float32)
    x0 = jnp.zeros((hm.layout.R, hm.params.win.shape[1]), jnp.float32)
    date0 = ModelDate(1982, 1, 3, 0)
    # compile + 1 chunk
    r.run(x0, atmo, logp, None, date0, chunk)
    t0 = time.perf_counter()
    out = r.run(x0, atmo, logp, None, date0, n_chunks * chunk)
    dt = time.perf_counter() - t0
    steps = len(out["atmo"]) if out["atmo"] is not None else n_chunks * chunk
    return dt / max(steps, 1), bool(out["aborted"])


_TRAIN_BLOCK_SRC = r"""
import time, numpy as np
import jax
jax.config.update("jax_enable_x64", True)   # device f64 ridge solve
import jax.numpy as jnp
from speedyml.core.config import ReservoirConfig
from speedyml.reservoir.generate import generate_esn
from speedyml.reservoir.training import (drive_and_accumulate, drive_discard,
                                         init_normal_eq, ridge_solve_device)

Rb, n_in, n_out, T, chunk = 8, 576, 136, 2048, 256
rcfg = ReservoirConfig()
params = generate_esn(0, Rb, n_in, n_out, n_model=n_out, m_target=6000)
rng = np.random.default_rng(0)
u = jnp.asarray(rng.normal(size=(T, Rb, n_in)), jnp.float32)
y = jnp.asarray(rng.normal(size=(T, Rb, n_out)), jnp.float32)
m = jnp.asarray(rng.normal(size=(T, Rb, n_out)), jnp.float32)
key = jax.random.PRNGKey(0)

def block():
    x = jnp.zeros((Rb, params.n), jnp.float32)
    x = drive_discard(params, x, u[:40], noise_mag=0.2, rng_key=key)
    acc = init_normal_eq(params, n_out)._replace(x=x)
    acc = drive_and_accumulate(params, acc, u[40:-1], y[41:], m[41:],
                               noise_mag=0.2, rng_key=key, chunk=chunk)
    w = ridge_solve_device(acc, n_out, rcfg.beta_res, rcfg.beta_model)
    return w

w = block()                      # compile + first run
np.asarray(w.ravel()[0])
t0 = time.perf_counter()
w = block()
np.asarray(w.ravel()[0])
dt = time.perf_counter() - t0
print(f"TRAIN_BLOCK_S {dt:.3f} T {T}")
"""


def bench_train_block():
    """One 8-region reference-scale training block (state loop +
    compensated accumulation + device-f64 ridge solve) in an x64
    subprocess; returns (seconds_per_block, samples)."""
    try:
        r = subprocess.run([sys.executable, "-c", _TRAIN_BLOCK_SRC],
                           capture_output=True, text=True, timeout=1200,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in r.stdout.splitlines():
            if line.startswith("TRAIN_BLOCK_S"):
                parts = line.split()
                return float(parts[1]), int(parts[3])
        print(f"# train block bench failed: {r.stdout[-200:]} "
              f"{r.stderr[-400:]}", file=sys.stderr)
    except Exception as e:
        print(f"# train block bench error: {e!r}", file=sys.stderr)
    return None, None


def main():
    out = {}
    hybrid_gps, step_s, trained = bench_hybrid_step()
    out["hybrid_ms_per_step"] = round(step_s * 1e3, 2)
    out["hybrid_mode"] = "float32"
    out["hybrid_weights"] = "trained" if trained else "random"
    # fast paths: bf16 grid compute for the SPEEDY window (spectral state
    # stays f32) and bf16-stored wout (f32 accumulation) for the readout's
    # HBM stream; tracked value = best mode
    hyb16, step16, _ = bench_hybrid_step(grid_compute="bfloat16")
    out["hybrid_ms_per_step_bf16"] = round(step16 * 1e3, 2)
    if hyb16 > hybrid_gps:
        hybrid_gps, out["hybrid_mode"] = hyb16, "bfloat16-grid"
    hybw, stepw, _ = bench_hybrid_step(wout_dtype="bfloat16")
    out["hybrid_ms_per_step_bf16_wout"] = round(stepw * 1e3, 2)
    if hybw > hybrid_gps:
        hybrid_gps, out["hybrid_mode"] = hybw, "bfloat16-wout"
    # the two fast paths touch disjoint streams (window grid compute vs
    # readout HBM) — the combination is the throughput mode
    hybb, stepb, _ = bench_hybrid_step(grid_compute="bfloat16",
                                       wout_dtype="bfloat16")
    out["hybrid_ms_per_step_bf16_both"] = round(stepb * 1e3, 2)
    if hybb > hybrid_gps:
        hybrid_gps, out["hybrid_mode"] = hybb, "bfloat16-grid+wout"

    if trained:
        # regression attribution (VERDICT r3): same program with random
        # weights isolates weight-content/layout effects; the r2-style
        # program (identity stats + zero precip) isolates the program
        # change between the r2 and r3 measurements
        _, step_rand, _ = bench_hybrid_step(force_random=True)
        out["hybrid_ms_per_step_random_weights"] = round(step_rand * 1e3, 2)
        _, step_r2, _ = bench_hybrid_step(force_random=True,
                                          r2_program=True)
        out["hybrid_ms_per_step_r2_program"] = round(step_r2 * 1e3, 2)
        _CACHE.pop("hm_random", None)     # release 3.7 GB of HBM

    fl_s, fl_aborted = bench_fastloop()
    out["fastloop_s_per_step"] = round(fl_s, 3)
    out["fastloop_aborted"] = fl_aborted

    ens_gps, ens_E, ens_sweep = bench_hybrid_ensemble()
    out["hybrid_ensemble_gps"] = round(ens_gps, 1)
    out["hybrid_ensemble_E"] = ens_E
    out["hybrid_ensemble_sweep"] = ens_sweep
    # bf16-stored wout halves both the resident bank and the readout
    # stream — extends the feasible E past the f32 HBM ceiling
    ens16, ens16_E, ens16_sweep = bench_hybrid_ensemble(
        ens_list=(96, 128, 192), wout_dtype="bfloat16", attribution=False)
    out["hybrid_ensemble_sweep_bf16_wout"] = ens16_sweep
    if ens16 > ens_gps:
        out["hybrid_ensemble_gps"] = round(ens16, 1)
        out["hybrid_ensemble_E"] = ens16_E
        out["hybrid_ensemble_mode"] = "bfloat16-wout"

    dry_f32, ens32 = bench_dry_core(grid_compute="float32")
    dry_bf16, ens16 = bench_dry_core(grid_compute="bfloat16")
    out["dry_core_f32"] = round(dry_f32, 1)
    out["dry_core_bf16"] = round(dry_bf16, 1)
    out["dry_core_ens"] = ens32 if dry_f32 >= dry_bf16 else ens16

    tb_s, tb_T = bench_train_block()
    if tb_s is not None:
        out["train_block_s"] = round(tb_s, 2)
        out["train_block_samples"] = tb_T

    # baseline: BENCH_BASELINE.json holds this framework's own earlier
    # rounds' numbers (the reference publishes none) — vs_baseline is
    # self-improvement, like-for-like per metric
    baseline = dry_base = None
    try:
        with open("BENCH_BASELINE.json") as f:
            b = json.load(f)
            baseline = b.get("hybrid_value")
            dry_base = b.get("value")       # r1 dry-core figure
    except Exception:
        pass
    vs = hybrid_gps / baseline if baseline else 1.0
    if dry_base:
        out["dry_core_vs_r1"] = round(max(dry_f32, dry_bf16) / dry_base, 3)

    print(json.dumps({
        "metric": "t30l8_hybrid_step_gridpoints_per_s_per_chip",
        "value": round(hybrid_gps, 1),
        "unit": "gridpoint-steps/s/chip",
        "vs_baseline": round(vs, 3),
        "baseline_note": "vs this framework's r2 first hybrid measurement"
                         " (reference publishes no throughput numbers)",
        **out,
    }))


if __name__ == "__main__":
    main()
