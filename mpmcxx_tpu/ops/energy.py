"""Total-energy dispatcher.

Pure-function equivalent of System::energy() (src/System.Energy.cpp:19-171):
build pair tensors, dispatch ES / polarization / polarvdw / RD / 3-body per
the static flags, and return an EnergyBreakdown pytree.  Under jit all
branches are resolved at trace time (flags are static), so each
configuration compiles to exactly the kernels it needs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as const
from ..flags import FFlags, RunParams
from ..state import SystemState
from . import ewald, pair_potentials, polar, polarvdw, three_body
from .pairwise import PairTensors, build_pairs, build_pairs_block


class EnergyBreakdown(NamedTuple):
    total: jnp.ndarray               # potential incl. gwp kinetic (K)
    rd: jnp.ndarray
    coulombic: jnp.ndarray
    polarization: jnp.ndarray
    vdw: jnp.ndarray
    three_body: jnp.ndarray
    kinetic: jnp.ndarray             # gwp kinetic
    mu: jnp.ndarray                  # [A,3] induced dipoles
    polarization_iterations: jnp.ndarray
    iterator_failed: jnp.ndarray
    dipole_rrms: jnp.ndarray
    cavity_penalty: jnp.ndarray      # cavity_autoreject_absolute extra


def cavity_absolute_check(state: SystemState, pt: PairTensors,
                          params: RunParams):
    """MAXVALUE if any inter-molecular pair closer than the absolute scale
    (src/System.Cavity.cpp:211-228)."""
    mask = pt.pair_once & pt.alive & ~pt.same_mol
    close = mask & (pt.rimg < params.cavity_autoreject_scale)
    return jnp.where(jnp.any(close), const.MAXVALUE, 0.0)


def energy_breakdown(state: SystemState, flags: FFlags,
                     params: RunParams) -> EnergyBreakdown:
    pt = build_pairs(state, flags)
    z = jnp.zeros(())
    coul = z
    pol = z
    vdw_e = z
    kin = z
    mu = state.mu * 0.0
    pol_iters = z
    failed = jnp.zeros((), bool)
    rrms = z

    amat = None
    if not (flags.use_sg or flags.rd_only):
        if flags.spectre:
            coul = ewald.coulombic_nopbc(state, pt)
        elif flags.gwp:
            coul = ewald.coulombic_nopbc_gwp(state, pt)
            kin = ewald.coulombic_kinetic_gwp(state)
        else:
            coul = ewald.coulombic(state, pt, flags, params)

        if flags.polarization:
            res = polar.polar(state, pt, flags, params)
            pol, mu, pol_iters, failed, rrms = res

        if flags.polarvdw:
            amat = polar.thole_amatrix(state, pt, flags, params)
            vdw_e = polarvdw.vdw(state, amat, pt, flags, params)

    # repulsion/dispersion
    if flags.rd_anharmonic:
        rd = pair_potentials.anharmonic(state, flags, params)
    elif flags.use_sg:
        rd = pair_potentials.sg(state, pt, flags, params)
    elif flags.use_dreiding:
        rd = pair_potentials.dreiding(state, pt, flags, params)
    elif flags.using_lj_buffered_14_7:
        rd = pair_potentials.lj_buffered_14_7(state, pt, flags, params)
    elif flags.using_disp_expansion:
        rd = pair_potentials.disp_expansion(state, pt, flags, params)
        if flags.disp_expansion_mbvdw:
            # mbvdw couples the many-body vdw term into rd
            # (src/System.Energy.cpp:1998-2002)
            if amat is None:
                amat = polar.thole_amatrix(state, pt, flags, params)
            rd = rd + polarvdw.vdw(state, amat, pt, flags, params)
    elif flags.cdvdw_exp_repulsion:
        rd = pair_potentials.exp_repulsion(state, pt, flags, params)
    elif not flags.gwp:
        rd = pair_potentials.lj(state, pt, flags, params)
    else:
        rd = z

    tb = three_body.axilrod_teller(state, pt, flags) \
        if flags.using_axilrod_teller else z

    total = rd + coul + pol + vdw_e + tb
    if flags.gwp:
        total = total + kin

    pen = cavity_absolute_check(state, pt, params) \
        if flags.cavity_autoreject_absolute else z

    return EnergyBreakdown(
        total=total, rd=rd, coulombic=coul, polarization=pol, vdw=vdw_e,
        three_body=tb, kinetic=kin, mu=mu,
        polarization_iterations=pol_iters, iterator_failed=failed,
        dipole_rrms=rrms, cavity_penalty=pen)


def energy_breakdown_blocked(state: SystemState, flags: FFlags,
                             params: RunParams,
                             block: int = 256) -> EnergyBreakdown:
    """Large-system full energy via O(B*A)-memory row-block tiling.

    Scans [B,A] tiles of the dense pair triangle instead of materialising
    [A,A] tensors (which at 10k atoms in f64 would need ~1 GB per tensor).
    Supports the strictly-pairwise + k-space flag set (same condition as
    ops.delta.supports); polarization and other dense-only subsystems
    raise.
    """
    if (flags.polarvdw or flags.using_axilrod_teller or flags.rd_crystal
            or flags.gwp or flags.spectre or flags.rd_anharmonic):
        raise ValueError("blocked energy requires pairwise + k-space terms "
                         "(+ optional Thole polarization); polarvdw/3-body/"
                         "rd_crystal/GWP/SPECTRE are dense-only")
    A = state.n_atom_slots
    nblocks = -(-A // block)

    def rd_pair(pt):
        if flags.use_dreiding:
            return pair_potentials.dreiding(state, pt, flags, params)
        if flags.using_lj_buffered_14_7:
            return pair_potentials.lj_buffered_14_7(state, pt, flags, params)
        if flags.using_disp_expansion:
            return pair_potentials.disp_expansion(state, pt, flags, params,
                                                  pair_only=True)
        if flags.cdvdw_exp_repulsion:
            return pair_potentials.exp_repulsion(state, pt, flags, params,
                                                 pair_only=True)
        if flags.use_sg:
            return pair_potentials.sg(state, pt, flags, params)
        return pair_potentials.lj(state, pt, flags, params, pair_only=True)

    use_es = not (flags.use_sg or flags.rd_only)

    def body(carry, b):
        rd_acc, es_acc, pen_acc = carry
        rows_f = b * block + jnp.arange(block)
        rows = jnp.where(rows_f < A, rows_f, -1)
        pt = build_pairs_block(state, flags, rows)
        rd_acc = rd_acc + rd_pair(pt)
        if use_es:
            if flags.wolf:
                es_acc = es_acc + ewald.coulombic_wolf(state, pt, flags,
                                                       params)
            else:
                es_acc = es_acc + ewald.coulombic_real(state, pt, flags,
                                                       params)
        if flags.cavity_autoreject_absolute:
            pen_acc = pen_acc | jnp.any(
                pt.pair_once & ~pt.same_mol &
                (pt.rimg < params.cavity_autoreject_scale))
        return (rd_acc, es_acc, pen_acc), None

    (rd, es, pen_hit), _ = jax.lax.scan(
        body, (jnp.zeros(()), jnp.zeros(()), jnp.zeros((), bool)),
        jnp.arange(nblocks))

    # whole-system self terms, added exactly once
    if flags.rd_lrc and not (flags.use_sg or flags.use_dreiding or
                             flags.using_lj_buffered_14_7):
        # reuse the self-only part: pair part with an empty row set
        empty = build_pairs_block(state, flags,
                                  -jnp.ones(1, dtype=jnp.int32))
        if flags.using_disp_expansion:
            rd = rd + pair_potentials.disp_expansion(state, empty, flags,
                                                     params)
        elif flags.cdvdw_exp_repulsion:
            rd = rd + pair_potentials.exp_repulsion(state, empty, flags,
                                                    params)
        elif not flags.rd_anharmonic:
            rd = rd + pair_potentials.lj(state, empty, flags, params)

    coul = jnp.zeros(())
    if use_es:
        coul = es
        if not flags.wolf:
            coul = coul + ewald.coulombic_reciprocal(state, flags, params) \
                + ewald.coulombic_self(state, params)

    z = jnp.zeros(())
    pol = z
    mu = state.mu * 0.0
    pol_iters = z
    failed = jnp.zeros((), bool)
    rrms = z
    if flags.polarization and use_es:
        res = polar.polar_blocked(state, flags, params, block=block)
        pol, mu, pol_iters, failed, rrms = res

    total = rd + coul + pol
    pen = jnp.where(pen_hit, const.MAXVALUE, 0.0) \
        if flags.cavity_autoreject_absolute else z
    return EnergyBreakdown(
        total=total, rd=rd, coulombic=coul, polarization=pol, vdw=z,
        three_body=z, kinetic=z, mu=mu,
        polarization_iterations=pol_iters, iterator_failed=failed,
        dipole_rrms=rrms, cavity_penalty=pen)


def total_energy(state: SystemState, flags: FFlags,
                 params: RunParams) -> jnp.ndarray:
    """Scalar potential energy incl. cavity penalty — the MC accept input
    (return value of System::energy(), src/System.Energy.cpp:167-170)."""
    eb = energy_breakdown(state, flags, params)
    return eb.total + eb.cavity_penalty
