"""Pallas kernel tests (interpret mode on the CPU backend)."""

import numpy as np
import jax.numpy as jnp

from speedyml.ops.accum import (accumulate_ss, accumulate_ss_xla,
                                pad_to_tile, TN)


def test_pad_to_tile():
    assert pad_to_tile(128) == 128
    assert pad_to_tile(129) == 256
    assert pad_to_tile(5896) == 6144  # multiple of 512 for wide j-tiles


def test_accumulate_ss_matches_xla():
    rng = np.random.default_rng(0)
    R, chunk, na = 3, 24, 200           # na not a tile multiple on purpose
    P = pad_to_tile(na)
    aug = jnp.asarray(rng.normal(size=(chunk, R, na)), jnp.float32)
    hi0 = jnp.asarray(rng.normal(size=(R, P, P)) * 10, jnp.float32)
    lo0 = jnp.zeros((R, P, P), jnp.float32)

    hi_p, lo_p = accumulate_ss(hi0, lo0, aug, interpret=True)
    hi_x, lo_x = accumulate_ss_xla(hi0, lo0, aug)
    tot_p = np.asarray(hi_p, np.float64) + np.asarray(lo_p, np.float64)
    tot_x = np.asarray(hi_x, np.float64) + np.asarray(lo_x, np.float64)
    np.testing.assert_allclose(tot_p, tot_x, rtol=1e-6, atol=1e-5)
    # padded region stays exactly the initial value + zero contributions
    np.testing.assert_allclose(tot_p[:, na:, na:],
                               np.asarray(hi0[:, na:, na:], np.float64),
                               rtol=1e-7)


def test_compensation_improves_precision():
    """The hi/lo pair must track many tiny increments that plain f32 loses."""
    rng = np.random.default_rng(1)
    R, na = 1, TN
    P = TN
    hi = jnp.full((R, P, P), 1e6, jnp.float32)
    lo = jnp.zeros((R, P, P), jnp.float32)
    ref64 = np.full((P, P), 1e6, np.float64)
    plain = np.full((P, P), 1e6, np.float32)
    for i in range(20):
        aug = jnp.asarray(rng.normal(size=(8, R, na)) * 0.01, jnp.float32)
        hi, lo = accumulate_ss(hi, lo, aug, interpret=True)
        d = np.einsum("tra,trb->rab", np.asarray(aug, np.float64),
                      np.asarray(aug, np.float64))[0]
        ref64 += d
        plain = (plain + d.astype(np.float32)).astype(np.float32)
    tot = np.asarray(hi, np.float64)[0] + np.asarray(lo, np.float64)[0]
    err_comp = np.abs(tot - ref64).max()
    err_plain = np.abs(plain.astype(np.float64) - ref64).max()
    assert err_comp < err_plain / 4, (err_comp, err_plain)
