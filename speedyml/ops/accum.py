"""Pallas TPU kernel: fused compensated normal-equation accumulation.

The training hot op is `ss += aug^T aug` batched over regions
(reservoir/training.py; reference DGEMM accumulation,
mod_reservoir.f90:1645-1701) with COMPENSATED f32 accumulation (two-sum
hi/lo pair). Unfused XLA does: einsum -> materialize D (R, na, na) in HBM ->
read ss_hi/ss_lo/D -> write ss_hi/ss_lo: ~5x(R*na^2) HBM moves per chunk. At
full scale (na=5896) the op is bandwidth-bound, so fusing the MXU matmul
with the two-sum update into one kernel (~3x moves: read hi/lo + write
hi/lo, D never leaves VMEM) is a ~1.7x step speedup.

The kernel tiles (region, i-tile, j-tile); each program computes one
(TN, TN) block of aug_r^T @ aug_r on the MXU and folds it into the aliased
ss_hi/ss_lo blocks. na is padded to a multiple of TN by the caller-facing
wrapper (zero columns are harmless: they add zero rows/cols).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

TN = 128    # MXU tile (i blocking)
TJ = 1024   # wide j blocking: amortizes per-program overhead; VMEM per
            # program ~ 2*(TN*TJ)*4B (hi+lo) * 2 (in+out alias) + a/b tiles
            # ~ 3.5 MB, well inside the ~16 MB VMEM with double buffering


def _two_sum(hi, lo, delta):
    s = hi + delta
    v = s - hi
    e = (hi - (s - v)) + (delta - v)
    return s, lo + e


def _kernel(a_ref, b_ref, hi_ref, lo_ref, hi_out, lo_out):
    # a_ref: (1, chunk, TN) i-tile; b_ref: (1, chunk, TJ) j-tile
    a = a_ref[0]
    b = b_ref[0]
    d = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    hi, lo = _two_sum(hi_ref[0], lo_ref[0], d)
    hi_out[0] = hi
    lo_out[0] = lo


@functools.partial(jax.jit, static_argnames=("interpret",))
def _accum_pallas(ss_hi, ss_lo, aug_r, interpret=False):
    """ss_{hi,lo}: (R, P, P); aug_r: (R, chunk, P) with P % TN == 0."""
    from jax.experimental import pallas as pl

    R, P, _ = ss_hi.shape
    chunk = aug_r.shape[1]
    tj = min(TJ, P)
    # P is a multiple of TN=128; find a j-tile that divides P, <= tj
    while P % tj:
        tj -= TN
    grid = (R, P // TN, P // tj)
    a_spec = pl.BlockSpec((1, chunk, TN), lambda r, i, j: (r, 0, i))
    b_spec = pl.BlockSpec((1, chunk, tj), lambda r, i, j: (r, 0, j))
    s_spec = pl.BlockSpec((1, TN, tj), lambda r, i, j: (r, i, j))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[a_spec, b_spec, s_spec, s_spec],
        out_specs=(s_spec, s_spec),
        out_shape=(jax.ShapeDtypeStruct(ss_hi.shape, ss_hi.dtype),
                   jax.ShapeDtypeStruct(ss_lo.shape, ss_lo.dtype)),
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(aug_r, aug_r, ss_hi, ss_lo)


def _kernel_scan(a_ref, b_ref, hi_in, lo_in, hi_out, lo_out):
    """Time-resident accumulation: grid (R, i, j, t) with t innermost; the
    (TS, TS) output block stays in VMEM across all t (revisiting pattern),
    so the big accumulators move through HBM ONCE per training scan instead
    of once per chunk."""
    import jax.experimental.pallas as pl

    t = pl.program_id(3)
    a = a_ref[0]
    b = b_ref[0]
    d = jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    @pl.when(t == 0)
    def _():
        hi, lo = _two_sum(hi_in[0], lo_in[0], d)
        hi_out[0] = hi
        lo_out[0] = lo

    @pl.when(t > 0)
    def _():
        hi, lo = _two_sum(hi_out[0], lo_out[0], d)
        hi_out[0] = hi
        lo_out[0] = lo


TS = 512   # square tile for the scan kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def _accum_scan_pallas(ss_hi, ss_lo, aug_r, chunk, interpret=False):
    """ss_{hi,lo}: (R, P, P); aug_r: (R, T, P), T % chunk == 0, P % TS == 0."""
    from jax.experimental import pallas as pl

    R, P, _ = ss_hi.shape
    T = aug_r.shape[1]
    nt = T // chunk
    ts = min(TS, P)
    assert P % ts == 0, (P, ts)
    grid = (R, P // ts, P // ts, nt)
    a_spec = pl.BlockSpec((1, chunk, ts), lambda r, i, j, t: (r, t, i))
    b_spec = pl.BlockSpec((1, chunk, ts), lambda r, i, j, t: (r, t, j))
    s_spec = pl.BlockSpec((1, ts, ts), lambda r, i, j, t: (r, i, j))
    return pl.pallas_call(
        _kernel_scan,
        grid=grid,
        in_specs=[a_spec, b_spec, s_spec, s_spec],
        out_specs=(s_spec, s_spec),
        out_shape=(jax.ShapeDtypeStruct(ss_hi.shape, ss_hi.dtype),
                   jax.ShapeDtypeStruct(ss_lo.shape, ss_lo.dtype)),
        interpret=interpret,
    )(aug_r, aug_r, ss_hi, ss_lo)


def accumulate_ss_scan(ss_hi, ss_lo, aug, chunk: int = 128,
                       interpret: bool = False):
    """Fold a WHOLE training series into the compensated normal equations
    with one kernel launch (the fused replacement for the per-chunk XLA
    einsum + two_sum, which re-streams the (R, na, na) accumulators from HBM
    every chunk).

    ss_{hi,lo}: (R, P, P) padded accumulators; aug: (T, R, na).
    """
    R, P, _ = ss_hi.shape
    T, _, na = aug.shape
    chunk = min(chunk, T)
    rem = (-T) % chunk
    aug_r = jnp.swapaxes(aug, 0, 1)                   # (R, T, na)
    if rem or na < P:
        aug_r = jnp.pad(aug_r, ((0, 0), (0, rem), (0, P - na)))
    return _accum_scan_pallas(ss_hi, ss_lo, aug_r, chunk,
                              interpret=interpret)


def pad_to_tile(n: int) -> int:
    """Pad to a multiple of 512 (keeps a wide j-tile available: 512 | P)
    or to one 128-tile for small n."""
    if n <= 512:
        return ((n + TN - 1) // TN) * TN
    return ((n + 511) // 512) * 512


def accum_available() -> bool:
    """Whether the fused Pallas path should be the default. Decision: OFF.
    Measured on TPU v5e, XLA's own einsum+two_sum fusion matches the square
    Pallas kernel (7.5 vs 8.1 ms/chunk at na=5896, R=8, chunk=128), and at
    reference scale the whole accumulation is ~0.1 s of a ~34 s training
    block (transfers + the f64 ridge solve dominate), so a faster variant
    cannot move the training wall time. The kernel stays as an opt-in,
    equivalence-tested alternative."""
    return False


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def accumulate_ss(ss_hi, ss_lo, aug, interpret: bool = False):
    """Fold one chunk into the compensated normal equations.

    ss_{hi,lo}: (R, P, P) PADDED accumulators (P = pad_to_tile(na));
    aug: (chunk, R, na) un-padded augmented states.
    Returns updated (ss_hi, ss_lo).
    """
    R, P, _ = ss_hi.shape
    chunk, _, na = aug.shape
    aug_r = jnp.swapaxes(aug, 0, 1)                  # (R, chunk, na)
    if na < P:
        aug_r = jnp.pad(aug_r, ((0, 0), (0, 0), (0, P - na)))
    # chunk must be a multiple of the f32 sublane (8)
    rem = (-chunk) % 8
    if rem:
        aug_r = jnp.pad(aug_r, ((0, 0), (0, rem), (0, 0)))
    return _accum_pallas(ss_hi, ss_lo, aug_r, interpret=interpret)


def accumulate_ss_xla(ss_hi, ss_lo, aug):
    """Reference XLA implementation (same math, unfused)."""
    d = jnp.einsum("tra,trb->rab", aug, aug)
    na = d.shape[-1]
    P = ss_hi.shape[-1]
    if na < P:
        d = jnp.pad(d, ((0, 0), (0, P - na), (0, P - na)))
    return _two_sum(ss_hi, ss_lo, d)
