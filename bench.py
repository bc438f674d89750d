"""Benchmark: grid-point-steps/s/chip of the T30L8 spectral core.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The
reference publishes no throughput numbers (BASELINE.md), so vs_baseline is
measured against this repo's own recorded figure when available.

Throughput counts ensemble members x steps x gridpoints (the ensemble/batch
axis is this model class's scaling dimension, SURVEY.md section 6): a single
T30L8 member (~1.5 MB of state) cannot utilize an MXU, so the per-chip
figure is measured at the best ensemble width.

NOTE (measurement): on remote-tunnel backends (axon) `block_until_ready`
returns before device execution finishes; the only true synchronization is a
device->host transfer, which this bench uses. The first recorded baseline
(8.3e9) predates this fix and is an async artifact (see BASELINE.md).
"""

import json
import time

import numpy as np


def main():
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

    cfg = ModelConfig(dtype="float32")
    dy = Dycore(cfg, orog=orog)
    state0 = dy.stepone(rest_state(dy), dy.zero_forcing())
    forcing = dy.zero_forcing()

    nsteps_chunk = 96
    gp = cfg.ix * cfg.il * cfg.kx

    def sync(s):
        np.asarray(s.ps[..., 0, 0, 0])   # true host sync

    def measure(ens: int, nchunks: int = 4) -> float:
        if ens == 1:
            def run_chunk(s):
                return dy.run_steps(s, forcing, nsteps_chunk)
            state = state0
        else:
            def step_one(s):
                return dy.step(s, forcing, 1, 1, "delt2")

            def run_chunk(s):
                def body(ss, _):
                    return jax.vmap(step_one)(ss), None
                s, _ = jax.lax.scan(body, s, None, length=nsteps_chunk)
                return s
            state = jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (ens,) + x.shape)
                + 0.0, state0)
        run = jax.jit(run_chunk)
        state = run(state)
        sync(state)                      # compile + warm
        t0 = time.perf_counter()
        for _ in range(nchunks):
            state = run(state)
        sync(state)
        dt = time.perf_counter() - t0
        return ens * nsteps_chunk * nchunks * gp / dt

    best = 0.0
    best_ens = 1
    for ens in (16, 64, 128):
        gps = measure(ens)
        if gps > best:
            best, best_ens = gps, ens

    baseline = None
    try:
        with open("BENCH_BASELINE.json") as f:
            baseline = json.load(f)["value"]
    except Exception:
        pass
    vs = best / baseline if baseline else 1.0

    print(json.dumps({
        "metric": "t30l8_gridpoint_steps_per_s_per_chip",
        "value": round(best, 1),
        "unit": "gridpoint-steps/s/chip",
        "vs_baseline": round(vs, 3),
        "ensemble": best_ens,
    }))


if __name__ == "__main__":
    main()
