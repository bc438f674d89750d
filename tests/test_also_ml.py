"""The inline ML-only solve (train_hybrid also_ml=True): the augmented
training vector is [model; nodes], so the ML-only normal equations
(fit_chunk_ml, mod_reservoir.f90:1491-1535) are the trailing sub-block of
the hybrid's — config 2 must come out (numerically) identical to a separate
ML-only training pass with the same seed."""

import numpy as np
import jax.numpy as jnp

from speedyml.core.config import ReservoirConfig
from speedyml.domain.decomposition import build_layout, pack_global
from speedyml.hybrid.experiment import (ml_variant, train_hybrid,
                                        transform_and_pack)
from tests.test_hybrid import _small_layout, _small_rcfg, _synthetic_truth


def _train_pair(tmp_ckpt=None):
    L = _small_layout()
    rcfg = _small_rcfg(noise_std=0.05)
    T = 400
    atmo, logp, precip, sst, tisr = _synthetic_truth(L, T)
    gv = transform_and_pack(L, atmo, logp, precip, sst, tisr,
                            rcfg.precip_epsilon)
    rng = np.random.default_rng(3)
    gv_model = gv + 0.3 * np.sin(gv) + \
        0.05 * rng.normal(size=gv.shape).astype(np.float32)
    hm_both = train_hybrid(L, rcfg, gv, gv_model, seed=2, also_ml=True,
                           checkpoint_dir=tmp_ckpt)
    hm_ml = train_hybrid(L, rcfg, gv, None, seed=2)
    return L, rcfg, gv, hm_both, hm_ml


def test_also_ml_matches_separate_training(tmp_path):
    L, rcfg, gv, hm_both, hm_ml = _train_pair()
    mlm = ml_variant(hm_both)
    assert mlm.ml_only and not hm_both.ml_only
    w_inline = np.asarray(mlm.params.wout)
    w_sep = np.asarray(hm_ml.params.wout)
    assert w_inline.shape == w_sep.shape
    # same seed -> identical reservoirs and drive noise; the per-chunk f32
    # GEMM tiles differently with/without the model block concatenated, and
    # the ridge system's conditioning amplifies that reassociation into
    # O(1e-3) relative weight differences (prediction-level agreement below
    # is the semantic check)
    scale = np.abs(w_sep).max()
    assert np.allclose(w_inline, w_sep, atol=2e-2 * scale), \
        np.abs(w_inline - w_sep).max() / scale

    # prediction-level equivalence: one closed-loop step from the same state
    x = mlm.synchronize(gv[:60])
    x2 = hm_ml.synchronize(gv[:60])
    gvc = jnp.asarray(gv[60])
    _, a1, l1, p1 = mlm.step(x, gvc)
    _, a2, l2, p2 = hm_ml.step(x2, gvc)
    assert np.allclose(np.asarray(a1), np.asarray(a2), atol=1e-3)


def test_also_ml_checkpoint_roundtrip(tmp_path):
    ck = str(tmp_path / "ck")
    L, rcfg, gv, hm_both, hm_ml = _train_pair(tmp_ckpt=ck)
    # resume path: a second call must load wout_ml from the block files
    rng = np.random.default_rng(3)
    gv_model = gv + 0.3 * np.sin(gv) + \
        0.05 * rng.normal(size=gv.shape).astype(np.float32)
    hm_res = train_hybrid(L, rcfg, gv, gv_model, seed=2, also_ml=True,
                          checkpoint_dir=ck)
    assert np.array_equal(hm_res.host_np["wout_ml"],
                          hm_both.host_np["wout_ml"])

    # a legacy checkpoint (no wout_ml) must be recomputed, not mis-loaded
    z = dict(np.load(ck + "/block_0000.npz"))
    z.pop("wout_ml")
    np.savez(ck + "/block_0000.npz", **z)
    hm_rec = train_hybrid(L, rcfg, gv, gv_model, seed=2, also_ml=True,
                          checkpoint_dir=ck)
    assert "wout_ml" in hm_rec.host_np
    assert np.allclose(hm_rec.host_np["wout_ml"],
                       hm_both.host_np["wout_ml"], atol=1e-5)
