"""Multi-device sharding tests on the virtual 8-CPU mesh (conftest forces
--xla_force_host_platform_device_count=8).

The reference's distribution correctness rests on per-rank region
independence (res_domain.f90:31-94); here the equivalent invariant is that
sharded execution is numerically identical to single-device execution."""

import jax
import jax.numpy as jnp
import numpy as np

from speedyml.domain.decomposition import build_layout
from speedyml.parallel.mesh import (make_mesh, region_sharding,
                                    series_sharding, shard_params,
                                    state_sharding)
from speedyml.reservoir.esn import predict_step
from speedyml.reservoir.generate import generate_esn
from speedyml.reservoir.training import drive_and_accumulate, init_normal_eq


def _setup(R=16, n_in=24, n_out=8, n_model=8, T=12):
    params = generate_esn(3, R, n_in, n_out, n_model, m_target=2 * n_in,
                          deg=4)
    # give wout real values so readout is nontrivial
    rng = np.random.default_rng(0)
    params = params._replace(
        wout=jnp.asarray(rng.normal(size=params.wout.shape) * 0.1,
                         jnp.float32))
    u = jnp.asarray(rng.normal(size=(T, R, n_in)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(T, R, n_out)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(T, R, n_model)), jnp.float32)
    return params, u, y, m


def test_sharded_training_matches_single_device():
    assert len(jax.devices()) >= 8
    params, u, y, m = _setup()

    acc0 = init_normal_eq(params, y.shape[-1])
    ref = drive_and_accumulate(params, acc0, u, y, m, chunk=4)

    mesh = make_mesh(8, tp=2)
    sp = shard_params(params, mesh)
    us = jax.device_put(u, series_sharding(mesh))
    ys = jax.device_put(y, series_sharding(mesh))
    ms = jax.device_put(m, series_sharding(mesh))
    accs = jax.tree.map(lambda a: jax.device_put(a, region_sharding(mesh)),
                        acc0)
    accs = accs._replace(x=jax.device_put(acc0.x, state_sharding(mesh)))
    out = jax.jit(lambda a, uu, yy, mm: drive_and_accumulate(
        sp, a, uu, yy, mm, chunk=4))(accs, us, ys, ms)

    np.testing.assert_allclose(np.asarray(ref.ss_hi), np.asarray(out.ss_hi),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.sy_hi), np.asarray(out.sy_hi),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(out.x),
                               rtol=1e-5, atol=1e-6)


def test_sharded_predict_matches_single_device():
    params, u, _, m = _setup()
    x0 = jnp.asarray(np.random.default_rng(1).normal(
        size=(u.shape[1], params.n)) * 0.1, jnp.float32)
    x_ref, out_ref = predict_step(params, x0, u[0], m[0])

    mesh = make_mesh(8, tp=2)
    sp = shard_params(params, mesh)
    xs = jax.device_put(x0, state_sharding(mesh))
    x_s, out_s = jax.jit(lambda xx, uu, mm: predict_step(sp, xx, uu, mm))(
        xs, jax.device_put(u[0], region_sharding(mesh)),
        jax.device_put(m[0], region_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(x_ref), np.asarray(x_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_s),
                               rtol=1e-4, atol=1e-5)


def test_graft_dryrun():
    """The driver's multichip dry run must work on the virtual mesh."""
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    g.dryrun_multichip(8)
