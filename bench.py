"""Benchmark: T30L8 throughput per chip.

Prints ONE JSON line. Primary metric (BASELINE.json north star): grid-points
per second per chip of the FULL HYBRID STEP — reference-scale batched ESN
prediction (1152 regions, n=5760 nodes, wout 1152x136x5896) + the 6-hour
SPEEDY window with full physics + pack/scatter — the production inner loop
(mpires.f90:218-804 + mod_reservoir.f90:1418-1489 combined). Secondary
metrics: the dry-core ensemble figure (previous rounds' tracked number) in
f32 and bfloat16 grid-compute modes.

vs_baseline compares the same metric against BENCH_BASELINE.json (the
reference publishes no throughput numbers; BASELINE.md).

NOTE (measurement): on remote-tunnel backends (axon) `block_until_ready`
returns before device execution finishes; the only true synchronization is a
device->host transfer, which this bench uses (BASELINE.md, round 1).
"""

import json
import time

import numpy as np


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


def bench_hybrid_step(n_steps=16, reference_scale=True,
                      grid_compute="float32", wout_dtype="float32"):
    """Full hybrid step at reference reservoir scale, single trajectory."""
    import jax
    import jax.numpy as jnp

    from speedyml.core.config import ModelConfig, ReservoirConfig
    from speedyml.domain.decomposition import build_layout, pack_global
    from speedyml.hybrid.forecast import SpeedyForecaster
    from speedyml.hybrid.state_io import GridState
    from speedyml.model import Speedy
    from speedyml.reservoir.esn import EsnParams, predict_step
    from speedyml.domain.decomposition import scatter_outputs
    from speedyml.core.calendar import ModelDate

    cfg = ModelConfig(dtype="float32", grid_compute=grid_compute)
    sp = Speedy(cfg)
    sp.initialize(year=1982, month=1)
    sp.run_days(2)                       # non-trivial state
    L = build_layout(radang_deg=np.degrees(np.asarray(sp.dy.tables.radang)))

    # reference-scale ESN parameters (timing-only: random values, real
    # shapes/sparsity — m=6000 -> n=5760, deg 6, mod_reservoir.f90:91-93)
    R, n_in, n_out = L.R, L.n_in, L.n_out
    m = 6000 if reference_scale else 1152
    n = (m // n_in) * n_in
    deg = 6
    rng = np.random.default_rng(0)
    na = n + n_out
    # production topology: circulant support ("ring with jumps") — the TPU
    # fast path the framework generates by default (reservoir/generate.py)
    from speedyml.reservoir.generate import ring_shifts
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
    if wout_dtype != "float32":
        from speedyml.reservoir.esn import cast_wout
        params = cast_wout(params, jnp.dtype(wout_dtype))

    fc = SpeedyForecaster(sp, hours=6, physics=True)
    date = sp.date
    surf, forcing, _, _ = fc._surf_forcing(date)
    if fc._fn is None:
        fc._fn = fc._build()
    idx = jnp.asarray(L.input_index)
    tidx = jnp.asarray(L.target_index)
    win_fn = fc._fn

    gs0 = None
    from speedyml.hybrid.state_io import extract
    gs0 = jax.tree.map(jnp.asarray, extract(sp.dy, sp.state, level=0))

    @jax.jit
    def hybrid_step(params, x, gs, surf, forcing, sst, tisr):
        # 1. SPEEDY 6-h window (imperfect-model forecast)
        res = win_fn(gs, surf, forcing)
        f_atmo = jnp.stack([res.gs.t, res.gs.u, res.gs.v,
                            jnp.maximum(res.gs.q, 1e-6)])
        f_pr = jnp.log1p(jnp.maximum(res.precip_mm, 0.0) / 0.001)
        model_gv = pack_global(L, f_atmo, res.gs.logp, f_pr, sst, tisr)
        # 2. ESN predict on [gv from current state]
        atmo = jnp.stack([gs.t, gs.u, gs.v, jnp.maximum(gs.q, 1e-6)])
        gv = pack_global(L, atmo, gs.logp, f_pr * 0.0, sst, tisr)
        x, out = predict_step(params, x, gv[idx], model_gv[tidx])
        a2, logp2, pr2 = scatter_outputs(L, out)
        gs2 = GridState(t=a2[0], u=a2[1], v=a2[2],
                        q=jnp.maximum(a2[3], 0.0), logp=logp2)
        return x, gs2

    sst = jnp.asarray(np.asarray(sp.coupler.sst_am), jnp.float32)
    tisr = jnp.asarray(np.full((cfg.il, cfg.ix), 300.0), jnp.float32)
    x = jnp.zeros((R, n), jnp.float32)

    # warm up (compile)
    x, gs = hybrid_step(params, x, gs0, surf, forcing, sst, tisr)
    _sync(gs.t)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        x, gs = hybrid_step(params, x, gs, surf, forcing, sst, tisr)
    _sync(gs.t)
    dt = time.perf_counter() - t0
    gp = cfg.ix * cfg.il * cfg.kx
    return n_steps * gp / dt, dt / n_steps


def main():
    out = {}
    hybrid_gps, step_s = bench_hybrid_step()
    out["hybrid_ms_per_step"] = round(step_s * 1e3, 2)
    out["hybrid_mode"] = "float32"
    # fast paths: bf16 grid compute for the SPEEDY window (spectral state
    # stays f32) and bf16-stored wout (f32 accumulation) for the readout's
    # HBM stream; tracked value = best mode
    hyb16, step16 = bench_hybrid_step(grid_compute="bfloat16")
    out["hybrid_ms_per_step_bf16"] = round(step16 * 1e3, 2)
    if hyb16 > hybrid_gps:
        hybrid_gps, out["hybrid_mode"] = hyb16, "bfloat16-grid"
    hybw, stepw = bench_hybrid_step(wout_dtype="bfloat16")
    out["hybrid_ms_per_step_bf16_wout"] = round(stepw * 1e3, 2)
    if hybw > hybrid_gps:
        hybrid_gps, out["hybrid_mode"] = hybw, "bfloat16-wout"

    dry_f32, ens32 = bench_dry_core(grid_compute="float32")
    dry_bf16, ens16 = bench_dry_core(grid_compute="bfloat16")
    out["dry_core_f32"] = round(dry_f32, 1)
    out["dry_core_bf16"] = round(dry_bf16, 1)
    out["dry_core_ens"] = ens32 if dry_f32 >= dry_bf16 else ens16

    # baseline: only compare like-for-like (the r1 baseline tracked the dry
    # core; the hybrid metric's own baseline appears under "hybrid_value")
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
        **out,
    }))


if __name__ == "__main__":
    main()
