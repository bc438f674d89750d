"""bench._random_hm anchored standardizer: with a packed state vector gv,
the zero-readout fixed point must be exactly the anchor state (so the
random-weight closed loop stays physical and fastloop times the full
production loop instead of safety-aborting — r5 post-wipe bench fix), and
every channel's scale must be positive and physically sized (q must NOT
get a uniform floor that floods the window with supersaturated noise)."""

import numpy as np

import bench
from speedyml.core.config import ReservoirConfig
from speedyml.domain.decomposition import build_layout
from speedyml.domain.standardize import unstandardize_out


def _small_layout():
    return build_layout(ix=16, il=8, kx=4, resx=4, resy=4)


def test_anchored_stats_zero_readout_is_anchor_state():
    L = _small_layout()
    rng = np.random.default_rng(3)
    gv = rng.normal(size=L.gv_len) * 10.0 + 250.0
    hm = bench._random_hm(L, ReservoirConfig(), m=2048, gv=gv)
    out0 = np.asarray(unstandardize_out(
        hm.stz, np.zeros((L.R, L.n_out), np.float32)))
    np.testing.assert_allclose(out0, gv[L.target_index], rtol=1e-5)
    assert np.all(np.asarray(hm.stz.in_std) > 0)
    assert np.all(np.asarray(hm.stz.out_std) > 0)


def test_anchored_stats_channel_scales():
    L = _small_layout()
    hm = bench._random_hm(L, ReservoirConfig(), m=2048,
                          gv=np.zeros(L.gv_len))
    out_std = np.asarray(hm.stz.out_std)
    s = L.out_sizes
    # atmo3d output is var-fastest: flat[v + nvars*(...)], nvars=4 (t,u,v,q)
    a = out_std[:, s["atmo3d"][0]:s["atmo3d"][1]].reshape(L.R, -1, L.nvars)
    assert np.all(a[:, :, 0] == 5.0)        # T: 6-h tendency scale
    assert np.all(a[:, :, 3] == 1e-3)       # q: NOT the uniform floor
    assert np.all(out_std[:, s["precip"][0]:s["precip"][1]] == 1.0)
    assert np.all(out_std[:, s["logp"][0]:s["logp"][1]] == 0.01)
    # identity fallback unchanged when no anchor state is given
    hm0 = bench._random_hm(L, ReservoirConfig(), m=2048)
    assert np.all(np.asarray(hm0.stz.out_std) == 1.0)
    assert np.all(np.asarray(hm0.stz.out_mean) == 0.0)
