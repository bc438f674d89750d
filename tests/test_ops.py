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


def test_accumulate_ss_scan_matches_xla():
    """The whole-series fused kernel == chunked XLA accumulation."""
    from speedyml.ops.accum import accumulate_ss_scan
    rng = np.random.default_rng(2)
    R, T, na, chunk = 2, 20, 136, 8       # T not a chunk multiple: padded
    P = pad_to_tile(na)
    aug = jnp.asarray(rng.normal(size=(T, R, na)), jnp.float32)
    hi0 = jnp.asarray(rng.normal(size=(R, P, P)), jnp.float32)
    lo0 = jnp.zeros((R, P, P), jnp.float32)
    hi_p, lo_p = accumulate_ss_scan(hi0, lo0, aug, chunk=chunk,
                                    interpret=True)
    ref = np.asarray(hi0, np.float64)[:, :na, :na] + np.einsum(
        "tra,trb->rab", np.asarray(aug, np.float64),
        np.asarray(aug, np.float64))
    tot = (np.asarray(hi_p, np.float64) +
           np.asarray(lo_p, np.float64))[:, :na, :na]
    np.testing.assert_allclose(tot, ref, rtol=1e-5, atol=1e-4)


def test_drive_and_accumulate_pallas_path_matches():
    """drive_and_accumulate(use_pallas=True, interpret via CPU) ==
    use_pallas=False."""
    import jax
    from speedyml.reservoir.generate import generate_esn
    from speedyml.reservoir.training import (drive_and_accumulate,
                                             init_normal_eq)
    from speedyml.ops import accum

    rng = np.random.default_rng(3)
    params = generate_esn(1, R=3, n_in=8, n_out=4, n_model=4, m_target=16,
                          deg=3)
    T = 24
    u = jnp.asarray(rng.normal(size=(T, 3, 8)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(T, 3, 4)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(T, 3, 4)), jnp.float32)
    acc0 = init_normal_eq(params, 4)

    ref = drive_and_accumulate(params, acc0, u, y, m, chunk=8,
                               use_pallas=False)
    orig = accum._accum_scan_pallas
    try:
        # route the TPU kernel through the interpreter on CPU
        import functools as ft

        @ft.partial(jax.jit, static_argnames=("chunk", "interpret"))
        def interp(hi, lo, aug_r, chunk, interpret=False):
            return orig(hi, lo, aug_r, chunk, interpret=True)
        accum._accum_scan_pallas = interp
        out = drive_and_accumulate(params, acc0, u, y, m, chunk=8,
                                   use_pallas=True)
    finally:
        accum._accum_scan_pallas = orig
    np.testing.assert_allclose(np.asarray(ref.ss_hi), np.asarray(out.ss_hi),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.sy_hi), np.asarray(out.sy_hi),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref.x), np.asarray(out.x),
                               rtol=1e-6, atol=1e-7)


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
