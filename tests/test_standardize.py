"""Standardization stats — including the clamped-SST std floor.

REGRESSION (r4 coupled blow-up): the training series clamps SST >= 272 K,
so fully ice-covered input patches are exactly constant and their std
collapsed to the eps floor (1e-8). The first weekly ocean feedback then
turned a +-0.05 K SST nudge at an ice-edge point into a ~1e6-sigma
standardized input, saturating the region's reservoir tanh and exploding
the readout (T +15 K in one step, magnitude INDEPENDENT of the anomaly
size, identical in both prediction-loop implementations)."""

import numpy as np
import jax.numpy as jnp

from speedyml.domain.decomposition import build_layout
from speedyml.domain.standardize import (SST_STD_FLOOR, compute_stats,
                                         compute_stats_gv, floor_sst_std,
                                         standardize_in)
from speedyml.hybrid.experiment import transform_and_pack
from tests.test_hybrid import _small_layout, _small_rcfg, _synthetic_truth


def _frozen_gv(L, T, seed=3):
    """Synthetic packed series whose northernmost rows are ice (SST
    constant at the 272 K clamp)."""
    rcfg = _small_rcfg()
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, T, seed=seed)
    sst = np.array(sst)
    sst[:, :4, :] = 250.0        # ice-blended SST, clamps to 272 in pack
    # (4 rows: the northern regions' full overlap patches are frozen, so
    # their pooled sst-channel std collapses without the floor)
    return transform_and_pack(L, atmo, logp, precip, sst, tisr,
                              rcfg.precip_epsilon)


def test_sst_std_floor_on_frozen_regions():
    L = _small_layout()
    gv = _frozen_gv(L, T=60)
    stz = compute_stats_gv(L, gv)
    t0, t1 = L.sizes["sst"]
    in_std = np.asarray(stz.in_std)
    assert np.all(in_std[:, t0:t1] >= SST_STD_FLOOR - 1e-6)
    # a 0.05 K SST nudge in a frozen region -> bounded standardized input
    gv2 = np.array(gv[0])
    s0 = L.gv_sizes["sst"][0]
    gv2[s0:s0 + L.ix] += 0.05    # northern row
    u1 = np.asarray(standardize_in(stz, jnp.asarray(gv[0])[
        jnp.asarray(L.input_index)]))
    u2 = np.asarray(standardize_in(stz, jnp.asarray(gv2)[
        jnp.asarray(L.input_index)]))
    assert np.abs(u2 - u1).max() <= 0.05 / SST_STD_FLOOR + 1e-6


def test_stats_gv_matches_dense_with_floor():
    L = _small_layout()
    gv = _frozen_gv(L, T=40)
    inputs = gv[:, L.input_index]
    a = compute_stats(L, inputs)
    b = compute_stats_gv(L, gv)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5,
                                   atol=1e-6)


def test_floor_sst_std_idempotent():
    L = _small_layout()
    gv = _frozen_gv(L, T=40)
    stz = compute_stats_gv(L, gv)
    once = floor_sst_std(stz, L)
    twice = floor_sst_std(once, L)
    np.testing.assert_array_equal(np.asarray(once.in_std),
                                  np.asarray(twice.in_std))
    # non-sst sections untouched
    t0, t1 = L.sizes["sst"]
    mask = np.ones(np.asarray(stz.in_std).shape[1], bool)
    mask[t0:t1] = False
    np.testing.assert_array_equal(np.asarray(once.in_std)[:, mask],
                                  np.asarray(stz.in_std)[:, mask])
