"""Host-side reservoir generation: adjacency, spectral radius, input weights.

Replaces the reference's makesparse + ARPACK largest-eigenvalue solve +
rescale (src/mod_linalg.f90:180-218, 220-514; src/mod_reservoir.f90:182-212)
with a fixed-degree random ELL graph and vectorized numpy power iteration —
only the largest |eigenvalue| is needed, so Arnoldi is unnecessary.
"""

from __future__ import annotations

import numpy as np


def make_ell_adjacency(rng: np.random.Generator, R: int, n: int, deg: int):
    """Random fixed-degree adjacency: each row has `deg` uniform(0,1) entries
    at uniform random columns. Same density deg/n and value distribution as
    the reference's shuffled COO (mod_linalg.f90:180-218)."""
    idx = rng.integers(0, n, size=(R, n, deg), dtype=np.int32)
    val = rng.uniform(0.0, 1.0, size=(R, n, deg))
    return idx, val


def spectral_radius_ell(idx: np.ndarray, val: np.ndarray,
                        iters: int = 200, seed: int = 0) -> np.ndarray:
    """Largest |eigenvalue| per batched ELL matrix via power iteration.

    Returns (R,) radii. Vectorized over the batch in numpy.
    """
    R, n, deg = idx.shape
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(R, n))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    lam = np.ones(R)
    ridx = np.arange(R)[:, None, None]
    for _ in range(iters):
        y = (val * x[ridx, idx]).sum(axis=-1)
        lam = np.linalg.norm(y, axis=1)
        x = y / np.maximum(lam[:, None], 1e-30)
    return lam


def radius_by_lat(lat_min_deg: np.ndarray, lat_max_deg: np.ndarray,
                  highest_lat: float = 45.0, max_radius: float = 0.7,
                  min_radius: float = 0.3) -> np.ndarray:
    """Spectral radius as a function of region latitude
    (res_domain.f90:1623-1660): max_radius poleward of highest_lat, otherwise
    the reference's constant interior value (max-min)/highest_lat + min."""
    smallest = np.minimum(np.abs(lat_min_deg), np.abs(lat_max_deg))
    interior = (max_radius - min_radius) / highest_lat + min_radius
    return np.where(smallest >= highest_lat, max_radius, interior)


def make_win(rng: np.random.Generator, R: int, n: int, n_in: int,
             sigma: float) -> np.ndarray:
    """Block-diagonal input weights as a flat (R, n) vector: node j reads
    input j // q with weight sigma*U(-1,1) (mod_reservoir.f90:262-283)."""
    assert n % n_in == 0
    return sigma * rng.uniform(-1.0, 1.0, size=(R, n))


def generate_esn(seed: int, R: int, n_in: int, n_out: int, n_model: int,
                 m_target: int = 6000, deg: int = 6, sigma: float = 0.5,
                 leakage: float = 1.0, radii=None, dtype=np.float32):
    """Full reservoir generation for R regions. Returns an EsnParams with a
    zero wout (trained later) plus the host copies.

    n is rounded to a multiple of n_in: n = round(m/n_in)*n_in
    (mod_reservoir.f90:169-172).
    """
    from .esn import EsnParams
    import jax.numpy as jnp

    q = max(1, int(round(m_target / n_in)))
    n = q * n_in
    rng = np.random.default_rng(seed)
    idx, val = make_ell_adjacency(rng, R, n, deg)
    lam = spectral_radius_ell(idx, val)
    if radii is None:
        radii = np.full(R, 0.9)
    val = val * (np.asarray(radii)[:, None, None] / lam[:, None, None])
    win = make_win(rng, R, n, n_in, sigma)
    wout = np.zeros((R, n_out, n_model + n), dtype=dtype)
    return EsnParams(
        a_idx=jnp.asarray(idx),
        a_val=jnp.asarray(val, dtype),
        win=jnp.asarray(win, dtype),
        wout=jnp.asarray(wout),
        node_map=jnp.asarray(np.arange(n) // q, np.int32),
        leakage=leakage,
    )
