"""Benchmark: grid-point-steps/s/chip of the T30L8 spectral core.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}. The reference
publishes no throughput numbers (BASELINE.md), so vs_baseline is measured
against this repo's own recorded first-round figure when available.

Runs on whatever backend JAX selects (the driver provides a real TPU chip).
"""

import json
import time

import numpy as np


def main():
    import jax

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
    state = rest_state(dy)
    forcing = dy.zero_forcing()

    nsteps_chunk = 24

    def run_chunk(s):
        return dy.run_steps(s, forcing, nsteps_chunk)

    run = jax.jit(run_chunk)
    state = dy.stepone(state, forcing)
    state = jax.block_until_ready(run(state))  # compile + warm

    # timed: several chunks
    nchunks = 8
    t0 = time.perf_counter()
    for _ in range(nchunks):
        state = run(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    steps = nsteps_chunk * nchunks
    gp = cfg.ix * cfg.il * cfg.kx
    gps = steps * gp / dt

    baseline = None
    try:
        with open("BENCH_BASELINE.json") as f:
            baseline = json.load(f)["value"]
    except Exception:
        pass
    vs = gps / baseline if baseline else 1.0

    print(json.dumps({
        "metric": "t30l8_gridpoint_steps_per_s_per_chip",
        "value": round(gps, 1),
        "unit": "gridpoint-steps/s/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
