"""Vertical localization tests (res_domain.f90:206-256: z-slabs with
vert_overlap)."""

import numpy as np
import jax.numpy as jnp

from speedyml.core.config import ReservoirConfig
from speedyml.domain.decomposition import (build_layout, gather_inputs,
                                           pack_global, scatter_outputs)
from speedyml.hybrid.experiment import train_hybrid, transform_and_pack
from tests.test_hybrid import _small_rcfg, _synthetic_truth


def _layout2():
    return build_layout(ix=12, il=6, kx=4, nvars=4, resx=2, resy=2,
                        overlap=1, nz_slabs=2, vert_overlap=1)


def test_slab_geometry():
    L = _layout2()
    assert L.nz == 2 and L.kz_core == 2 and L.inpz == 4
    assert L.R == 2 * (12 // 2) * (6 // 2)
    # input atmo section covers clamped z range per slab
    ngp = L.il * L.ix
    a0 = L.gv_sizes["atmo3d"][0]
    lev = ((L.input_index[:, :L.sizes["atmo3d"][1]] - a0) // ngp) % L.kx
    nh = L.nregy * L.nregx
    # slab 0 regions: levels clamped to [0, kz_core + overlap - 1]
    assert lev[:nh].max() == L.kz_core + L.vert_overlap - 1 == 2
    assert lev[:nh].min() == 0
    # slab 1 regions: levels in [kz_core - overlap, kx-1]
    assert lev[nh:].min() == L.kz_core - L.vert_overlap == 1
    assert lev[nh:].max() == L.kx - 1


def test_slab_scatter_roundtrip():
    L = _layout2()
    rng = np.random.default_rng(0)
    atmo = rng.normal(size=(4, L.kx, L.il, L.ix))
    logp = rng.normal(size=(L.il, L.ix))
    precip = rng.normal(size=(L.il, L.ix))
    sst = rng.normal(size=(L.il, L.ix))
    tisr = rng.normal(size=(L.il, L.ix))
    gv = np.asarray(pack_global(L, jnp.asarray(atmo), jnp.asarray(logp),
                                jnp.asarray(precip), jnp.asarray(sst),
                                jnp.asarray(tisr)))
    outvec = gv[L.target_index]
    a2, lp2, pr2 = scatter_outputs(L, jnp.asarray(outvec))
    np.testing.assert_allclose(np.asarray(a2), atmo, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lp2), logp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pr2), precip, rtol=1e-6)
    # gather shape sanity
    u = gather_inputs(L, jnp.asarray(gv))
    assert u.shape == (L.R, L.n_in)


def test_vertical_ml_training_e2e():
    """ml-only training/prediction works with 2 vertical slabs and tracks
    the synthetic system."""
    L = _layout2()
    rcfg = _small_rcfg()
    T = 400
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, T, seed=31)
    gv = transform_and_pack(L, atmo, logp, precip, sst, tisr,
                            rcfg.precip_epsilon)
    hm = train_hybrid(L, rcfg, gv, None, seed=4)
    x = hm.synchronize(gv[300:340])
    x, a_c, l_c, p_c = hm.step(x, jnp.asarray(gv[340]))
    rms = np.sqrt(np.mean((np.asarray(a_c) - atmo[341]) ** 2))
    assert rms < 0.5, rms
    assert np.isfinite(np.asarray(a_c)).all()
