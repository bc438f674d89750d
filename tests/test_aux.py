"""Auxiliary-subsystem tests: diagnostics, output writer, SPPT, v_ml/v_p
contribution split (SURVEY.md section 5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from speedyml.core.config import ModelConfig


@pytest.fixture(scope="module")
def dycore():
    from speedyml.dynamics.core import Dycore
    return Dycore(ModelConfig(dtype="float64"))


def test_spectral_rms(dycore):
    from speedyml.dynamics.initial import rest_state
    from speedyml.utils.diag import spectral_rms
    st = rest_state(dycore)
    rms = spectral_rms(st.at_level(0))
    assert rms["vor"] == 0.0 and rms["div"] == 0.0
    assert rms["t"] > 0.0 and rms["ps"] >= 0.0   # rest state has T profile


def test_check_finite_and_nan_guard():
    from speedyml.utils.diag import check_finite, nan_guard
    good = {"a": np.ones(3), "b": jnp.zeros((2, 2))}
    assert check_finite(good)
    bad = {"a": np.array([1.0, np.nan])}
    assert not check_finite(bad)
    x = jnp.array([1.0, jnp.nan, jnp.inf])
    y = jax.jit(lambda v: nan_guard(v, "t"))(x)
    np.testing.assert_array_equal(np.asarray(y), [1.0, 0.0, 0.0])


def test_forecast_writer_roundtrip(tmp_path):
    from speedyml.io.output import ForecastWriter, read_forecast
    rng = np.random.default_rng(0)
    kx, il, ix = 3, 4, 8
    p = str(tmp_path / "fc.nc")
    frames = [(rng.normal(size=(4, kx, il, ix)).astype(np.float32),
               rng.normal(size=(il, ix)).astype(np.float32),
               np.abs(rng.normal(size=(il, ix))).astype(np.float32))
              for _ in range(3)]
    with ForecastWriter(p, kx, il, ix, with_precip=True) as w:
        for atmo, logp, pr in frames:
            w.append(atmo, logp, precip_mm=pr)
    data = read_forecast(p)
    assert data["Temperature"].shape == (3, kx, il, ix)
    np.testing.assert_allclose(data["Temperature"][1], frames[1][0][0],
                               rtol=1e-6)
    np.testing.assert_allclose(data["U-wind"][2], frames[2][0][1], rtol=1e-6)
    np.testing.assert_allclose(data["p6hr"][0], frames[0][2], rtol=1e-6)


def test_sppt_pattern(dycore):
    """AR(1) spectral noise: bounded, roughly the target stddev, and
    temporally correlated with coefficient ~phi (mod_sppt.f90)."""
    from speedyml.physics.sppt import Sppt
    sp = Sppt(dycore)
    key = jax.random.PRNGKey(0)
    st = sp.init(key)
    pats = []
    for i in range(40):
        st, pat = sp.step(st, jax.random.fold_in(key, i + 1))
        pats.append(np.asarray(pat))
    pats = np.stack(pats)        # (T, kx, il, ix)
    assert np.abs(pats).max() <= 1.0
    sd = pats[20:].std()
    assert 0.15 < sd < 0.5, sd   # target 0.33
    # lag-1 autocorrelation near phi
    a, b = pats[20:-1].reshape(-1), pats[21:].reshape(-1)
    rho = np.corrcoef(a, b)[0, 1]
    assert abs(rho - sp.phi) < 0.1, (rho, sp.phi)


def test_readout_split_sums_to_readout():
    from speedyml.reservoir.esn import readout, readout_split
    from speedyml.reservoir.generate import generate_esn
    rng = np.random.default_rng(1)
    params = generate_esn(0, R=4, n_in=6, n_out=5, n_model=5, m_target=12,
                          deg=3)
    params = params._replace(wout=jnp.asarray(
        rng.normal(size=params.wout.shape), jnp.float32))
    x = jnp.asarray(rng.normal(size=(4, params.n)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
    full = readout(params, x, m)
    tot, v_ml, v_p = readout_split(params, x, m)
    np.testing.assert_allclose(np.asarray(tot), np.asarray(full), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v_ml + v_p), np.asarray(full),
                               rtol=1e-5)
    assert not np.allclose(np.asarray(v_ml), 0)
    assert not np.allclose(np.asarray(v_p), 0)
