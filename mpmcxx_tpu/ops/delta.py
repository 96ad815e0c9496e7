"""Incremental Delta-E move evaluation.

The reference gets cheap MC steps from per-pair energy caches flagged by
``recalculate_energy`` (src/System.cpp:1202-1279, the lj/coulombic kernels'
``if (pair_ptr->recalculate_energy)`` branches).  The TPU-native equivalent:
for a move that touches one molecule, evaluate the SAME pair kernels on the
rect [S,A] slice (S = that molecule's atom slots) in the old and new states
and take the difference — O(S*A) instead of O(A^2) — plus an incrementally
maintained Ewald structure factor for the k-space term, O(S*K) instead of
O(A*K).

Supported whenever the energy is strictly pairwise + k-space:
no polarization / polarvdw / Axilrod-Teller / rd_crystal / GWP / SPECTRE /
anharmonic.  The chain falls back to the full recompute otherwise, and the
host driver refreshes from scratch every corrtime to kill floating-point
drift (the role of flag_all_pairs, src/System.cpp:1284-1297).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import constants as const
from ..flags import FFlags, RunParams
from ..state import SystemState
from . import ewald, pair_potentials
from .pairwise import (build_pairs_rect, normalize_window, phase_dot,
                       slice_rows, sum_small_rows)


class SFCache(NamedTuple):
    """Ewald structure factors over the static hemisphere k-lattice."""
    re: jnp.ndarray   # [K]
    im: jnp.ndarray   # [K]


def supports(flags: FFlags) -> bool:
    """True when the total energy is strictly pairwise + k-space (SG is
    pairwise and therefore supported)."""
    return not (flags.polarization or flags.polarvdw or
                flags.using_axilrod_teller or flags.rd_crystal or
                flags.gwp or flags.spectre or flags.rd_anharmonic)


def uses_recip(flags: FFlags) -> bool:
    return not (flags.use_sg or flags.rd_only or flags.wolf)


def sf_compute(state: SystemState, flags: FFlags, params: RunParams
               ) -> SFCache:
    k, _ = ewald.kvectors(state, flags.ewald_kmax)
    q = jnp.where(state.atom_alive() & ~state.frozen, state.charge, 0.0)
    phase = phase_dot(state.pos, k)
    return SFCache(re=q @ jnp.cos(phase), im=q @ jnp.sin(phase))


def recip_energy(sf: SFCache, state: SystemState, flags: FFlags,
                 params: RunParams):
    _, k2 = ewald.kvectors(state, flags.ewald_kmax)
    alpha = params.ewald_alpha
    pot = jnp.sum(jnp.exp(-k2 / (4.0 * alpha * alpha)) / k2 *
                  (sf.re ** 2 + sf.im ** 2))
    return pot * 4.0 * const.pi / state.pbc.volume


def sf_shift(state: SystemState, flags: FFlags, rows, sign: float
             ) -> SFCache:
    """Contribution of ``rows`` atoms to the structure factor (0 where the
    row is padding, dead, or frozen)."""
    A = state.n_atom_slots
    S = rows.shape[0]
    start, _, valid = normalize_window(rows, A)
    alive_r = slice_rows(state.atom_alive(), start, S)
    frozen_r = slice_rows(state.frozen, start, S)
    valid = valid & alive_r & ~frozen_r
    q = jnp.where(valid, slice_rows(state.charge, start, S), 0.0)
    k, _ = ewald.kvectors(state, flags.ewald_kmax)
    phase = phase_dot(slice_rows(state.pos, start, S), k)     # [S,K]
    return SFCache(re=sign * sum_small_rows(q, jnp.cos(phase)),
                   im=sign * sum_small_rows(q, jnp.sin(phase)))


def sf_apply(sf: SFCache, *shifts) -> SFCache:
    re, im = sf.re, sf.im
    for s in shifts:
        re = re + s.re
        im = im + s.im
    return SFCache(re, im)


def rect_rd(state: SystemState, flags: FFlags, params: RunParams, rows,
            pt=None):
    """RD energy restricted to pairs touching ``rows`` (plus full-system
    self/LRC-self sums, which cancel or difference correctly)."""
    if pt is None:
        pt = build_pairs_rect(state, flags, rows)
    if flags.use_dreiding:
        return pair_potentials.dreiding(state, pt, flags, params)
    if flags.using_lj_buffered_14_7:
        return pair_potentials.lj_buffered_14_7(state, pt, flags, params)
    if flags.using_disp_expansion:
        return pair_potentials.disp_expansion(state, pt, flags, params)
    if flags.cdvdw_exp_repulsion:
        return pair_potentials.exp_repulsion(state, pt, flags, params)
    if flags.use_sg:
        return pair_potentials.sg(state, pt, flags, params)
    return pair_potentials.lj(state, pt, flags, params)


def rect_es_real(state: SystemState, flags: FFlags, params: RunParams,
                 rows, pt=None):
    if pt is None:
        pt = build_pairs_rect(state, flags, rows)
    if flags.wolf:
        return ewald.coulombic_wolf(state, pt, flags, params)
    return ewald.coulombic_real(state, pt, flags, params)


class DeltaResult(NamedTuple):
    d_rd: jnp.ndarray
    d_coul: jnp.ndarray
    sf_new: SFCache
    recip_new: jnp.ndarray   # k-space energy of the proposal (0 if unused)


def delta_energy(old_state: SystemState, new_state: SystemState,
                 rows, sf: SFCache, flags: FFlags, params: RunParams,
                 recip_old=None) -> DeltaResult:
    """Energy difference new-old for a move that only changed the atoms in
    ``rows`` (positions and/or their molecule's aliveness).

    ``recip_old``: the current state's k-space energy, if the caller
    carries it (it only changes on accept, so recomputing it every step
    is pure per-step latency — ~15% of a small-system NVT step).
    """
    # one rect pair build per state, shared by the RD and ES kernels
    pt_old = build_pairs_rect(old_state, flags, rows)
    pt_new = build_pairs_rect(new_state, flags, rows)
    rd_old = rect_rd(old_state, flags, params, rows, pt_old)
    rd_new = rect_rd(new_state, flags, params, rows, pt_new)
    d_rd = rd_new - rd_old

    if flags.use_sg or flags.rd_only:
        return DeltaResult(d_rd, jnp.zeros(()), sf, jnp.zeros(()))

    er_old = rect_es_real(old_state, flags, params, rows, pt_old)
    er_new = rect_es_real(new_state, flags, params, rows, pt_new)
    d_coul = er_new - er_old

    # self term differences are full-system O(A) sums (they change only
    # under insertion/removal)
    d_coul = d_coul + (ewald.coulombic_self(new_state, params) -
                       ewald.coulombic_self(old_state, params))

    if uses_recip(flags):
        sf_new = sf_apply(sf,
                          sf_shift(old_state, flags, rows, -1.0),
                          sf_shift(new_state, flags, rows, +1.0))
        e_old = recip_energy(sf, old_state, flags, params) \
            if recip_old is None else recip_old
        e_new = recip_energy(sf_new, new_state, flags, params)
        d_coul = d_coul + (e_new - e_old)
    else:
        sf_new = sf
        e_new = jnp.zeros(())

    return DeltaResult(d_rd, d_coul, sf_new, e_new)
