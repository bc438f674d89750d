"""Determinism + GrADS output tests (SURVEY.md section 5.2: deterministic
key-split RNG replaces the reference's wall-clock seeding)."""

import numpy as np
import jax
import jax.numpy as jnp

from speedyml.core.config import ModelConfig


def test_training_is_deterministic():
    from speedyml.hybrid.experiment import train_hybrid, transform_and_pack
    from tests.test_hybrid import _small_layout, _small_rcfg, _synthetic_truth
    L = _small_layout()
    rcfg = _small_rcfg(noise_std=0.1)
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, 150, seed=1)
    gv = transform_and_pack(L, atmo, logp, precip, sst, tisr,
                            rcfg.precip_epsilon)
    hm1 = train_hybrid(L, rcfg, gv, None, seed=3)
    hm2 = train_hybrid(L, rcfg, gv, None, seed=3)
    np.testing.assert_array_equal(np.asarray(hm1.params.wout),
                                  np.asarray(hm2.params.wout))
    hm3 = train_hybrid(L, rcfg, gv, None, seed=4)
    assert not np.array_equal(np.asarray(hm1.params.wout),
                              np.asarray(hm3.params.wout))


def test_dycore_scan_equals_python_loop():
    """run_steps (lax.scan) == repeated step() calls: no hidden state."""
    from speedyml.dynamics.core import Dycore
    from speedyml.dynamics.initial import rest_state
    dy = Dycore(ModelConfig(dtype="float64"))
    forcing = dy.zero_forcing()
    s0 = dy.stepone(rest_state(dy), forcing)
    s_scan = dy.run_steps(s0, forcing, 5)
    s_loop = s0
    for _ in range(5):
        s_loop = dy.step(s_loop, forcing, 1, 1, "delt2")
    for a, b in zip(s_scan, s_loop):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14)


def test_grads_roundtrip(tmp_path):
    from speedyml.io.grads import GradsWriter, read_grads
    rng = np.random.default_rng(0)
    kx, il, ix = 3, 4, 8
    lat = np.linspace(-80, 80, il)
    sig = np.linspace(0.1, 0.9, kx)
    base = str(tmp_path / "out")
    frames = [(rng.normal(size=(4, kx, il, ix)).astype(np.float32),
               rng.normal(size=(il, ix)).astype(np.float32))
              for _ in range(2)]
    with GradsWriter(base, lat, sig, ix) as w:
        for a3, a2 in frames:
            w.append(list(a3), [a2])
    arr3, arr2 = read_grads(base, kx, il, ix)
    assert arr3.shape == (2, 4, kx, il, ix)
    np.testing.assert_allclose(arr3[1], frames[1][0], rtol=1e-6)
    np.testing.assert_allclose(arr2[0, 0], frames[0][1], rtol=1e-6)
    ctl = open(base + ".ctl").read()
    assert "tdef 2 linear" in ctl and "vars 5" in ctl
