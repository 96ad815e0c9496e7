"""Cavity-biased insertion (umbrella sampling).

Vectorised form of src/System.Cavity.cpp: the G^3 occupancy grid becomes one
[G^3, A] distance test, the accessible-volume Monte Carlo integration one
batched dart throw, and biased insertion a masked categorical draw over open
cavities — all inside jit (the reference rebuilds the grid with pointer
loops before every move).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const
from ..state import SystemState


class CavityInfo(NamedTuple):
    open_mask: jnp.ndarray      # [G^3] bool: cavity point unoccupied
    points: jnp.ndarray         # [G^3,3] cartesian grid points
    probability: jnp.ndarray    # open fraction
    volume: jnp.ndarray         # accessible volume estimate (A^3)


def grid_points(state: SystemState, grid_size: int):
    """Cartesian cavity-grid points at fractional (i+1)/(G+1) - 1/2
    (src/System.Cavity.cpp:39-58)."""
    G = grid_size
    f = (jnp.arange(G) + 1.0) / (G + 1.0)
    fx, fy, fz = jnp.meshgrid(f, f, f, indexing="ij")
    frac = jnp.stack([fx, fy, fz], axis=-1).reshape(-1, 3) - 0.5
    return frac @ state.pbc.basis


def update_grid(state: SystemState, grid_size: int, radius, key,
                dartscale: float = 0.1, n_darts: int = 0) -> CavityInfo:
    """Occupancy + bias probability + MC-integrated accessible volume
    (cavity_update_grid src/System.Cavity.cpp:15-160)."""
    pts = grid_points(state, grid_size)                     # [P,3]
    # wrapped positions per molecule COM (reference uses wrapped_pos)
    com = state.mol_com()
    frac = com @ state.pbc.reciprocal
    shift = jnp.round(frac) @ state.pbc.basis
    shift = jnp.where(state.mol_frozen[:, None], 0.0, shift)
    wpos = state.pos - shift[state.mol_id]

    alive = state.atom_alive()
    from ..ops.pallas_cavity import occupancy
    occupied = occupancy(pts, wpos, alive, radius)
    open_mask = ~occupied
    prob = jnp.mean(open_mask.astype(jnp.float64))

    # accessible-volume darts: the reference throws volume/10
    # (update_cavity_volume src/System.Cavity.cpp:122-133); the count
    # must be static under jit, so callers pass it precomputed from the
    # initial volume (MCOptions.cavity_darts via the runner)
    if n_darts <= 0:
        n_darts = 256
    frac_d = jax.random.uniform(key, (n_darts, 3)) - 0.5
    darts = frac_d @ state.pbc.basis
    dd = darts[:, None, :] - pts[None, :, :]
    rr2 = jnp.sum(dd * dd, axis=-1)
    hit = jnp.any((rr2 < radius * radius) & open_mask[None, :], axis=1)
    volume = jnp.mean(hit.astype(jnp.float64)) * state.pbc.volume
    return CavityInfo(open_mask, pts, prob, volume)


def biased_insert_position(info: CavityInfo, key):
    """Pick a random open cavity point; returns (com, biased) where biased
    is False when no cavity is open (src/System.MonteCarlo.cpp:742-764).

    The reference draws ``(n-1) - rint((n-1) * rand)`` — a rounded (not
    floored) index whose two endpoint cavities get half the weight of
    interior ones.  Mirrored verbatim (the cavities are physically
    exchangeable, but the quirk is free to keep)."""
    n_open = jnp.sum(info.open_mask)
    u = jax.random.uniform(key)
    nm1 = jnp.maximum(n_open - 1, 0).astype(jnp.float64)
    k = (nm1 - jnp.round(u * nm1)).astype(jnp.int32)
    cum = jnp.cumsum(info.open_mask.astype(jnp.int32))
    idx = jnp.argmax(cum == (k + 1))
    return info.points[idx], n_open > 0


def remove_biased_flag(key, avg_probability, grid_size: int):
    """Cavity-bias flag for REMOVE moves
    (src/System.MonteCarlo.cpp:838-843)."""
    p = (1.0 - avg_probability) ** float(grid_size ** 3)
    return jax.random.uniform(key) >= p
