"""Axilrod-Teller triple-dipole 3-body dispersion.

Dense [A,A,A] einsum version of src/System.Energy.cpp:1653-1751: the
reference's sextuple pointer loop over molecule/atom triples becomes three
batched contractions of the minimum-image displacement tensor.  Counting
matches the reference: all ordered triples of distinct atoms spanning >= 2
distinct molecules, divided by 6.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import constants as const
from ..flags import FFlags
from ..state import SystemState
from .pairwise import PairTensors

BOHR3 = 6.7483345                # polarizability A^3 -> a.u. factor
C9_UNIT = 0.0032539449 / (3.166811429e-6)  # H*Bohr^9 -> K*A^9


def axilrod_teller(state: SystemState, pt: PairTensors, flags: FFlags):
    a = state.polarizability * BOHR3
    if flags.midzuno_kihara_approx:
        c9_atom = 0.75 * a * state.c6
    else:
        c9_atom = state.c9
    a3 = a ** 3
    # per-atom c9/alpha^3 ratio for the harmonic-mean mixing rule
    ratio = jnp.where(a3 == 0.0, 0.0, c9_atom / jnp.where(a3 == 0.0, 1.0, a3))
    inv_ratio = jnp.where(ratio == 0.0, 0.0,
                          1.0 / jnp.where(ratio == 0.0, 1.0, ratio))

    # mixed c9 for triple (i,j,k): (a3_i a3_j a3_k)^(1/3) * 3/(sum 1/ratio)
    geo = (a3[:, None, None] * a3[None, :, None] * a3[None, None, :])
    geo = jnp.abs(geo) ** (1.0 / 3.0)
    inv_sum = (inv_ratio[:, None, None] + inv_ratio[None, :, None] +
               inv_ratio[None, None, :])
    c9 = jnp.where(inv_sum == 0.0, 0.0,
                   geo * 3.0 / jnp.where(inv_sum == 0.0, 1.0, inv_sum))
    any_zero = ((a[:, None, None] == 0.0) | (a[None, :, None] == 0.0) |
                (a[None, None, :] == 0.0))
    c9 = jnp.where(any_zero, 0.0, c9) * C9_UNIT

    d = pt.dimg       # d[i,j] = min-image (r_i - r_j)
    r = jnp.where(pt.rimg == 0.0, 1.0, pt.rimg)

    # dot products between the three triangle edges
    dot_ij_ik = jnp.einsum("ija,ika->ijk", d, d)
    dot_ij_jk = jnp.einsum("ija,jka->ijk", d, d)
    dot_ik_jk = jnp.einsum("ika,jka->ijk", d, d)
    rij = r[:, :, None]
    rik = r[:, None, :]
    rjk = r[None, :, :]
    # cos(i)*cos(j)*cos(k) assembled exactly as the reference's a.b products:
    # (-ij.-ik)(ij.-jk)(ik.jk) / (rij^2 rik^2 rjk^2)
    cos_part = 3.0 * (dot_ij_ik * (-dot_ij_jk) * dot_ik_jk /
                      (rij ** 2 * rik ** 2 * rjk ** 2))
    pot = c9 * (1.0 + cos_part) / (rij * rik * rjk) ** 3

    A = state.n_atom_slots
    idx = jnp.arange(A)
    distinct = ((idx[:, None, None] != idx[None, :, None]) &
                (idx[:, None, None] != idx[None, None, :]) &
                (idx[None, :, None] != idx[None, None, :]))
    mol = state.mol_id
    same_all = ((mol[:, None, None] == mol[None, :, None]) &
                (mol[:, None, None] == mol[None, None, :]))
    alive = state.atom_alive()
    alive3 = (alive[:, None, None] & alive[None, :, None] &
              alive[None, None, :])
    mask = distinct & ~same_all & alive3
    return jnp.sum(jnp.where(mask, pot, 0.0)) / 6.0
