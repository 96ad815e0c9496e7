"""Path-integral NVT ensemble.

The reference represents P Trotter beads as P full ``System`` replicas, one
MPI rank per bead, with 4x MPI_Allgather of energy components per MC step
(src/SimulationControl.PathIntegral.cpp:31-196, 752-805).  Here beads are a
leading ``[P, ...]`` axis on the state pytree: per-bead energies are one
vmapped kernel and the "Allgather" is a mean over the bead axis.

Implements:
* lockstep whole-chain displace with common dice
  (PI_displace, :1320-1387)
* Coker bead-chain staging with rotating anchor and COM-preserving shift
  (PI_perturb_bead_COMs, :1450-1554; Coker et al. JCP 86, 5689 (1987))
* Subramanian orientation staging by recursive bisection — the recursion
  tree depends only on P, so it is unrolled into a static schedule
  (generate_orientation_configs, :1599-1680; Subramanian et al. JCP 146,
  094105 (2017))
* the Tuckerman 12.5.12 primitive energy estimator
  (PI_calculate_kinetic, :810-828)
* PI-NVT Boltzmann factor with potential + COM-chain + orientation-chain
  contributors (PI_NVT_boltzmann_factor, :490-547).  As in the reference,
  the orientation contribution omits the reduced-mass weight (the fetched
  reduced_mass at :518 is unused) and the system-wide orientation chain
  term returns 0 (:975-977) — both quirks preserved.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const
from .. import quaternion as quat
from ..config.schema import SimConfig
from ..config.validate import validate
from ..flags import FFlags, RunParams
from ..io import output as out_io
from ..io import pqr as pqr_io
from ..io.trajectory import PIFrameWriter
from ..ops import delta as delta_mod
from ..ops.energy import energy_breakdown
from ..state import SystemState, build_state
from . import moves
from .averages import AvgObservables, nodestats_from_counters


# ---------------------------------------------------------------------------
# bead-stacked state helpers
# ---------------------------------------------------------------------------

def stack_states(states: list[SystemState]) -> SystemState:
    """[P]-stack single-system states into one bead-axis pytree."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def bead(state_stack: SystemState, s: int) -> SystemState:
    return jax.tree_util.tree_map(lambda x: x[s], state_stack)


def mol_coms(stack: SystemState):
    """[P, M, 3] per-bead molecule centers of mass."""
    return jax.vmap(lambda s: s.mol_com())(stack)


# ---------------------------------------------------------------------------
# estimators
# ---------------------------------------------------------------------------

# NOTE on units: the reference carries these chain lengths in SI (kg*m^2)
# and multiplies by constants like pi^2 kB T / 2 hbar^2 ~ 1e44.  TPU
# "float64" is double-word float32 emulation with float32's EXPONENT range
# (~1e+-38), so both ends over/underflow there.  Device values therefore
# stay in amu*Angstrom^2, and every SI conversion is folded into the
# host-evaluated module constants below (exact f64 on the host).
_C_KIN = 0.5 * const.kB * const.AMU2KG * 1e-20 / const.hBar2
_C_CHAIN = (const.pi ** 2 * const.kB * const.AMU2KG * 1e-20 /
            (2.0 * const.h * const.h))
_C_ORIENT = const.pi ** 2 * const.kB * 1e-20 / (2.0 * const.h * const.h)
_C_SIGMA = const.hBar2 * 1e20 / (const.kB * const.AMU2KG)
_C_KH = (2.0 * const.pi ** 2 * const.kB * const.AMU2KG * 1e-20 /
         (const.h * const.h))


def chain_mass_length2_mol(stack: SystemState, mol):
    """Mass-weighted squared COM ring length of one molecule's bead chain,
    in amu*Angstrom^2 (PI_chain_mass_length2, :916-970)."""
    coms = mol_coms(stack)[:, mol, :]                   # [P,3]
    delta = coms - jnp.roll(coms, -1, axis=0)
    len2 = jnp.sum(delta * delta)
    return len2 * stack.mol_mass[0, mol]


def chain_mass_length2_system(stack: SystemState):
    """Sum over movable molecules (..._ENTIRE_SYSTEM, :859-904)."""
    coms = mol_coms(stack)                              # [P,M,3]
    delta = coms - jnp.roll(coms, -1, axis=0)
    len2 = jnp.sum(delta * delta, axis=(0, 2))          # [M]
    movable = stack.mol_alive[0] & ~(stack.mol_frozen[0] |
                                     stack.mol_adiabatic[0] |
                                     stack.mol_target[0])
    return jnp.sum(jnp.where(movable, len2 * stack.mol_mass[0], 0.0))


def orient_mu_length2_mol(stack: SystemState, mol, site_atom, bond_length):
    """Squared ring length of the bond-orientation chain, in Angstrom^2
    (PI_orientational_mu_length2, :978-1039).  No mass weight (reference
    quirk)."""
    coms = mol_coms(stack)[:, mol, :]                   # [P,3]
    handle = stack.pos[:, site_atom, :]                 # [P,3]
    bond = handle - coms
    norm = jnp.linalg.norm(bond, axis=-1, keepdims=True)
    bond = bond_length * bond / jnp.where(norm == 0, 1.0, norm)
    delta = bond - jnp.roll(bond, -1, axis=0)
    return jnp.sum(delta * delta)


def pi_kinetic(stack: SystemState, temperature):
    """Primitive energy estimator kinetic part in Kelvin
    (PI_calculate_kinetic, :810-828)."""
    P = stack.pos.shape[0]
    N = bead(stack, 0).count_N().astype(jnp.float64)
    T = temperature
    cml2 = chain_mass_length2_system(stack)        # amu*Angstrom^2
    # (term1 - 0.5 * (P/(beta^2 hbar^2)) * cml2_SI) / kB, constants folded
    return 1.5 * N * T * P - _C_KIN * P * T * T * cml2


# ---------------------------------------------------------------------------
# PI moves (operate on the stacked state with shared dice)
# ---------------------------------------------------------------------------

def pi_displace(stack: SystemState, key, mol, move_factor, rot_factor):
    """Rigid whole-chain translation + rotation about the aggregate COM
    (PI_displace, :1320-1387)."""
    k1, k2, k3 = jax.random.split(key, 3)
    dice = jax.random.uniform(k1, (6,))
    cutoff = stack.pbc.cutoff[0]
    trans = move_factor * dice[:3] * cutoff
    trans = jnp.where(dice[3:] < 0.5, -trans, trans)

    sel = (stack.mol_id[0] == mol)[None, :, None]       # [1,A,1]
    pos = jnp.where(sel, stack.pos + trans[None, None, :], stack.pos)

    # aggregate COM over beads (post-translation)
    tmp = stack.replace(pos=pos)
    pi_com = jnp.mean(mol_coms(tmp)[:, mol, :], axis=0)  # [3]

    axis = jax.random.normal(k2, (3,))
    angle_deg = jax.random.uniform(k3) * rot_factor
    q = quat.from_axis_angle_deg(axis, angle_deg)
    rotated = quat.rotate(q, pos - pi_com) + pi_com
    pos = jnp.where(sel, rotated, pos)
    return stack.replace(pos=pos)


def pi_spinflip(stack: SystemState, mol):
    cur = stack.nuclear_spin[:, mol]
    new = jnp.where(cur == const.NUCLEAR_SPIN_PARA,
                    const.NUCLEAR_SPIN_ORTHO, const.NUCLEAR_SPIN_PARA)
    return stack.replace(nuclear_spin=stack.nuclear_spin.at[:, mol].set(new))


def coker_stage_coms(coms, key, n, starter, mass_amu, temperature, P):
    """Coker staging of a P-bead COM ring: perturb n beads starting after
    the rotating anchor; preserve the aggregate COM
    (PI_perturb_bead_COMs, :1453-1554)."""
    chain_com = jnp.mean(coms, axis=0)

    keys = jax.random.split(key, n)

    def body(j, carry):
        coms, prev_idx = carry
        bead_idx = (prev_idx + 1) % P
        final_idx = (starter + n + 1) % P
        tB = jnp.asarray(n - j, jnp.float64)
        tA = jnp.asarray(n + 1 - j, jnp.float64)
        init_f = tB / tA
        term_f = 1.0 - init_f
        sigma = jnp.sqrt(_C_SIGMA * init_f /
                         (temperature * P * mass_amu))
        pert = jax.random.normal(keys[j], (3,))
        newpos = init_f * coms[prev_idx] + term_f * coms[final_idx] + \
            sigma * pert
        coms = coms.at[bead_idx].set(newpos)
        return coms, bead_idx

    coms, _ = jax.lax.fori_loop(0, n, body, (coms, starter))
    # COM-preserving shift (:1541-1549)
    delta = jnp.mean(coms, axis=0) - chain_com
    return coms - delta


def _orientation_schedule(P: int):
    """Static recursion order of the bisection sampler
    (generate_orientation_configs, :1599-1680)."""
    out = []

    def rec(start, end, p):
        if p <= P:
            J = (start + end) // 2
            K = 0 if end == P else end
            out.append((start, J, K, p))
            if p < P:
                rec(start, J, p * 2)
                rec(J, end, p * 2)

    rec(0, P, 2)
    return out


def sample_orientations(key, P: int, bond_length_A, reduced_mass_amu,
                        temperature):
    """Generate P bead orientations by recursive bisection. Returns
    [P,3] unit vectors."""
    sched = _orientation_schedule(P)
    b2 = bond_length_A * bond_length_A

    k0, key = jax.random.split(key)
    # initial random orientation: uniform on sphere
    v = jax.random.normal(k0, (3,))
    v = v / jnp.linalg.norm(v)
    orients = jnp.zeros((P, 3)).at[0].set(v)

    keys = jax.random.split(key, len(sched))
    # pi b^2 / lambda^2 with lambda^2 = h^2/(2 pi u kB T), folded to amu/A
    kh = _C_KH * b2 * reduced_mass_amu * temperature

    for (start, J, K_idx, p), kk in zip(sched, keys):
        kC, kB = jax.random.split(kk)
        vec_I = orients[start]
        vec_K = orients[K_idx]
        bisector = (vec_I + vec_K) / 2.0
        bisector = bisector / jnp.linalg.norm(bisector)

        if p > 2:
            vec_IK = vec_K - vec_I
            cosang = jnp.dot(vec_I, vec_K) / (
                jnp.linalg.norm(vec_I) * jnp.linalg.norm(vec_K))
            psi = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        else:
            tmp = jnp.asarray([1.0, 2.0, -3.0])
            dvec = tmp + bisector
            dvec = dvec / jnp.linalg.norm(dvec)
            vec_IK = jnp.cross(dvec, bisector)
            psi = 0.0

        C = jax.random.uniform(kC)
        K = 4.0 * kh * p * jnp.cos(psi * 0.5)
        angle_A = jnp.arccos(jnp.clip(
            1.0 + (1.0 / K) * jnp.log(1.0 - C * (1.0 - jnp.exp(-2.0 * K))),
            -1.0, 1.0))
        angle_B = jax.random.uniform(kB) * const.twoPi

        qB = quat.from_axis_angle(bisector, angle_B)
        vec_beta = quat.rotate(qB, vec_IK)
        qF = quat.from_axis_angle(vec_beta, angle_A)
        vec_J = quat.rotate(qF, bisector)
        orients = orients.at[J].set(vec_J)

    return orients


def orient_molecule(pos, mol_sel, com, site_atom_pos, target_dir):
    """Rotate a molecule (atoms selected by mol_sel) about its COM so the
    COM->site vector points along target_dir (Molecule::orient,
    src/Molecule.cpp:211-254)."""
    cur = site_atom_pos - com
    cur = cur / jnp.linalg.norm(cur)
    cosang = jnp.dot(cur, target_dir) / jnp.linalg.norm(target_dir)
    angle = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    axis = jnp.cross(cur, target_dir)
    q = quat.from_axis_angle(axis, angle)
    rotated = quat.rotate(q, pos - com) + com
    return jnp.where(mol_sel[:, None], rotated, pos)


class PerturbSpec(NamedTuple):
    """Static per-species orientation data resolved at setup."""
    has_orientation: bool
    site_offset: int       # atom offset within the molecule
    bond_length: float     # Angstrom
    reduced_mass: float    # amu (converted from the keyword's kg at setup)


def pi_perturb_beads(stack: SystemState, key, mol, n_chain, starter,
                     temperature, spec: PerturbSpec, mol_atom_start):
    """Bead-perturbation move: orientation staging then COM staging
    (PI_perturb_beads, :1392-1397)."""
    P = stack.pos.shape[0]
    k_orient, k_com = jax.random.split(key)
    pos = stack.pos

    if spec.has_orientation:
        orients = sample_orientations(
            k_orient, P, spec.bond_length, spec.reduced_mass, temperature)
        site_atom = mol_atom_start + spec.site_offset
        sel = stack.mol_id[0] == mol
        coms = mol_coms(stack)[:, mol, :]

        def orient_bead(p, c, site_p, tgt):
            return orient_molecule(p, sel, c, site_p, tgt)

        pos = jax.vmap(orient_bead)(pos, coms, pos[:, site_atom, :], orients)
        stack = stack.replace(pos=pos)

    # COM staging
    coms = mol_coms(stack)[:, mol, :]
    mass = stack.mol_mass[0, mol]
    new_coms = coker_stage_coms(coms, k_com, n_chain, starter, mass,
                                temperature, P)
    delta = new_coms - coms                             # [P,3]
    sel = (stack.mol_id[0] == mol)[None, :, None]
    pos = jnp.where(sel, stack.pos + delta[:, None, :], stack.pos)
    return stack.replace(pos=pos)


# ---------------------------------------------------------------------------
# PI chain driver
# ---------------------------------------------------------------------------

class PICarry(NamedTuple):
    stack: SystemState
    potential_current: jnp.ndarray   # last-accepted bead-avg potential
    obs_components: jnp.ndarray      # [4]: rd, coul, polar, vdw (bead-avg)
    comps_per_bead: jnp.ndarray      # [P,4] per-bead components
    sf: delta_mod.SFCache            # [P,K] per-bead structure factors
    temperature: jnp.ndarray
    key: jnp.ndarray
    starter_bead: jnp.ndarray        # rotating Coker anchor
    step: jnp.ndarray
    accept: jnp.ndarray              # [7]
    reject: jnp.ndarray              # [7]
    bf: jnp.ndarray


class PIStepOut(NamedTuple):
    bf: jnp.ndarray
    accepted: jnp.ndarray
    movetype: jnp.ndarray


def pi_potential(stack: SystemState, flags: FFlags, params: RunParams):
    """Bead-averaged potential components (PI_calculate_potential,
    :752-805). Returns ([4] mean components, total, failed)."""
    comps, failed = pi_potential_per_bead(stack, flags, params)
    mean = jnp.mean(comps, axis=0)
    return mean, jnp.sum(mean), jnp.any(failed)


def pi_potential_per_bead(stack: SystemState, flags: FFlags,
                          params: RunParams):
    """[P,4] per-bead (rd, coul, polar, vdw) and [P] failure flags."""
    def one(s):
        eb = energy_breakdown(s, flags, params)
        return jnp.stack([eb.rd, eb.coulombic, eb.polarization, eb.vdw]), \
            eb.iterator_failed
    return jax.vmap(one)(stack)


def pi_sf_compute(stack: SystemState, flags: FFlags, params: RunParams):
    """[P,K] per-bead Ewald structure factors."""
    return jax.vmap(lambda s: delta_mod.sf_compute(s, flags, params))(stack)


def pi_delta_potential(old_stack: SystemState, new_stack: SystemState,
                       rows, sf, comps_old, flags: FFlags,
                       params: RunParams):
    """Incremental per-bead Delta-E: the move touched only ``rows`` atoms
    of each bead.  Returns (comps_new [P,4], sf_new, total)."""
    def one(so, sn, sfb):
        d = delta_mod.delta_energy(so, sn, rows, sfb, flags, params)
        return d.d_rd, d.d_coul, d.sf_new
    d_rd, d_coul, sf_new = jax.vmap(one)(old_stack, new_stack, sf)
    zeros = jnp.zeros_like(d_rd)
    comps_new = comps_old + jnp.stack([d_rd, d_coul, zeros, zeros], axis=1)
    total = jnp.sum(jnp.mean(comps_new, axis=0))
    return comps_new, sf_new, total


def make_pi_step(flags: FFlags, base_params: RunParams, opts,
                 perturb_specs, mol_atom_starts, trial_chain_len: int,
                 incremental: bool = False, max_mol_atoms: int = 1,
                 any_orientation: bool = True, mol_atom_counts=None):
    """opts: MCOptions-like with bead_perturb_probability etc.

    ``any_orientation``: static — when no species carries orientation
    metadata, the bisection-staging graph is omitted entirely instead of
    being traced into a dead jnp.where branch.

    ``mol_atom_counts``: static per-molecule-slot atom counts; with it the
    Delta-E row addressing is an O(S) gather from the static topology
    (mc/chain.py's rows_of pattern) instead of an O(A) jnp.nonzero scan."""
    if mol_atom_counts is not None:
        mol_atom_counts = jnp.asarray(mol_atom_counts, jnp.int32)

    def rows_of(mol):
        off = jnp.arange(max_mol_atoms, dtype=jnp.int32)
        if mol_atom_counts is None:
            return None
        rows = mol_atom_starts[mol].astype(jnp.int32) + off
        return jnp.where(off < mol_atom_counts[mol], rows, -1)

    def step(carry: PICarry, _):
        key, k_move, k_tgt, k_apply, k_acc = jax.random.split(carry.key, 5)
        stack = carry.stack
        P = stack.pos.shape[0]
        params = dataclasses.replace(base_params,
                                     temperature=carry.temperature)
        T = carry.temperature

        b0 = bead(stack, 0)
        target, n_mov = moves.pick_random_movable(b0, k_tgt)

        r = jax.random.uniform(k_move)
        if opts.quantum_rotation:
            movetype = jnp.where(
                r < opts.spinflip_probability, const.MOVETYPE_SPINFLIP,
                jnp.where(r < opts.spinflip_probability +
                          opts.bead_perturb_probability,
                          const.MOVETYPE_PERTURB_BEADS,
                          const.MOVETYPE_DISPLACE))
        else:
            movetype = jnp.where(r < opts.bead_perturb_probability,
                                 const.MOVETYPE_PERTURB_BEADS,
                                 const.MOVETYPE_DISPLACE)

        spec = perturb_specs  # per-molecule static spec arrays
        site_atom = mol_atom_starts[target] + spec.site_offset[target]
        has_orient = spec.has_orientation[target]
        bond_len = spec.bond_length[target]
        red_mass = spec.reduced_mass[target]

        def chain_metrics(st):
            cml = chain_mass_length2_mol(st, target)
            if not any_orientation:
                return cml, jnp.zeros(())
            oml = orient_mu_length2_mol(st, target, site_atom, bond_len)
            oml = jnp.where(has_orient & (bond_len > 0), oml, 0.0)
            return cml, oml

        is_perturb = movetype == const.MOVETYPE_PERTURB_BEADS
        cml_init, oml_init = chain_metrics(stack)

        def do_displace(st):
            return pi_displace(st, k_apply, target, opts.move_factor,
                               opts.rot_factor)

        def do_spin(st):
            return pi_spinflip(st, target)

        def do_perturb(st):
            # dynamic per-target orientation spec via traced select
            sp = PerturbSpec(True, 0, 0.0, 0.0)  # placeholder; handled below
            P_ = st.pos.shape[0]
            k_orient, k_com = jax.random.split(k_apply)
            pos = st.pos
            sel = st.mol_id[0] == target

            def with_orient(pos):
                orients = sample_orientations(
                    k_orient, P_, bond_len,
                    jnp.maximum(red_mass, 1e-30), T)
                coms = mol_coms(st)[:, target, :]
                def orient_bead(p, c, site_p, tgt):
                    return orient_molecule(p, sel, c, site_p, tgt)
                return jax.vmap(orient_bead)(
                    pos, coms, pos[:, site_atom, :], orients)

            if any_orientation:
                pos = jnp.where(has_orient & (bond_len > 0) &
                                (red_mass > 0), with_orient(pos), pos)
                st = st.replace(pos=pos)

            coms = mol_coms(st)[:, target, :]
            mass = st.mol_mass[0, target]
            new_coms = coker_stage_coms(coms, k_com, trial_chain_len,
                                        carry.starter_bead, mass, T, P_)
            delta = new_coms - coms
            pos = jnp.where(sel[None, :, None], st.pos + delta[:, None, :],
                            st.pos)
            return st.replace(pos=pos)

        new_stack = jax.lax.switch(
            jnp.select([movetype == const.MOVETYPE_DISPLACE,
                        movetype == const.MOVETYPE_SPINFLIP], [0, 1], 2),
            [do_displace, do_spin, do_perturb], stack)

        if incremental:
            rows = rows_of(target)
            if rows is None:
                rows = jnp.nonzero(stack.mol_id[0] == target,
                                   size=max_mol_atoms, fill_value=-1)[0]
            comps_pb, sf_new, pot_trial = pi_delta_potential(
                stack, new_stack, rows, carry.sf, carry.comps_per_bead,
                flags, params)
            comps = jnp.mean(comps_pb, axis=0)
            failed = jnp.zeros((), bool)
        else:
            comps_pb, failed_pb = pi_potential_per_bead(new_stack, flags,
                                                        params)
            comps = jnp.mean(comps_pb, axis=0)
            pot_trial = jnp.sum(comps)
            failed = jnp.any(failed_pb)
            sf_new = carry.sf
        cml_trial, oml_trial = chain_metrics(new_stack)

        delta_pot = pot_trial - carry.potential_current
        delta_chain = jnp.where(is_perturb, cml_trial - cml_init, 0.0)
        delta_orient = jnp.where(is_perturb, oml_trial - oml_init, 0.0)

        # (PI_NVT_boltzmann_factor, :490-547); SI constants folded into
        # _C_CHAIN/_C_ORIENT so TPU f64-emulation stays in exponent range
        chain_2K = P * T * _C_CHAIN      # multiplies amu*Angstrom^2
        orient_2K = P * T * _C_ORIENT    # multiplies Angstrom^2 (massless
                                         # orientation chain, quirk kept)
        pr = jnp.where(
            new_stack.nuclear_spin[0, target] == const.NUCLEAR_SPIN_PARA,
            stack.rot_partfunc_g[0, target] /
            (stack.rot_partfunc_g[0, target] + stack.rot_partfunc_u[0, target]),
            stack.rot_partfunc_u[0, target] /
            (stack.rot_partfunc_g[0, target] + stack.rot_partfunc_u[0, target]))

        bf_perturb = jnp.exp(-delta_pot / T - delta_chain * chain_2K -
                             delta_orient * orient_2K)
        bf_displace = jnp.exp(-delta_pot / T)
        bf = jnp.select(
            [movetype == const.MOVETYPE_PERTURB_BEADS,
             movetype == const.MOVETYPE_SPINFLIP],
            [bf_perturb, pr], bf_displace)

        finite = jnp.isfinite(pot_trial)
        bf = jnp.where(finite, bf, 0.0)
        accept = (jax.random.uniform(k_acc) < bf) & ~failed

        sel_t = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(accept, x, y), a, b)
        stack_out = sel_t(new_stack, stack)
        pot_out = jnp.where(accept, pot_trial, carry.potential_current)
        comps_out = jnp.where(accept, comps, carry.obs_components)
        comps_pb_out = jnp.where(accept, comps_pb, carry.comps_per_bead)
        sf_out = sel_t(sf_new, carry.sf)

        # simulated annealing (PI main loop :151-160)
        if opts.simulated_annealing:
            tgt = opts.simulated_annealing_target
            if opts.simulated_annealing_linear:
                remaining = jnp.maximum(opts.numsteps - carry.step - 1, 0)
                T_new = jnp.where(remaining == 0, tgt,
                                  T + (tgt - T) / jnp.maximum(remaining, 1))
            else:
                T_new = tgt + (T - tgt) * opts.simulated_annealing_schedule
            T_out = jnp.where(accept, T_new, T)
        else:
            T_out = T

        starter_out = jnp.where(is_perturb,
                                (carry.starter_bead + 1) % P,
                                carry.starter_bead)

        onehot = jax.nn.one_hot(movetype, 7, dtype=jnp.int64)
        out = PIStepOut(bf=bf, accepted=accept, movetype=movetype)
        return PICarry(stack_out, pot_out, comps_out, comps_pb_out, sf_out,
                       T_out, key, starter_out, carry.step + 1,
                       carry.accept + jnp.where(accept, onehot, 0),
                       carry.reject + jnp.where(accept, 0, onehot),
                       bf), out

    return step


# ---------------------------------------------------------------------------
# host-side driver
# ---------------------------------------------------------------------------

class PISimulation:
    """PI-NVT run (PI_nvt_mc, src/SimulationControl.PathIntegral.cpp:31-196).
    """

    def __init__(self, cfg: SimConfig, P: int = None, quiet: bool = False,
                 mesh=None):
        """``mesh``: optional jax.sharding.Mesh; places the bead axis
        on its devices (bead-per-device, parallel/meshing.py) — the
        TPU-native form of the reference's bead-per-rank MPI_Allgather
        (src/SimulationControl.PathIntegral.cpp:752-805).  Requires
        P %% n_devices == 0; trajectory is bit-identical to
        single-device (tests/test_multichip_drivers.py)."""
        if P is None:
            P = cfg.total_trotter_number or 8
        self.P = P
        self.cfg = validate(cfg, n_systems=P)
        self.quiet = quiet
        self.mesh = mesh
        self.out = sys.stdout

        basis = self._basis(cfg)

        # per-bead geometry: restart files or replicated base input
        states = []
        meta = None
        for s in range(P):
            path = cfg.pqr_input
            if cfg.parallel_restarts:
                cand = pqr_io.make_filename(
                    cfg.pqr_restart if cfg.pqr_restart not in ("", "/dev/null")
                    else cfg.job_name + ".restart.pqr", s)
                import os
                if os.path.exists(cand):
                    path = cand
                elif os.path.exists(cand + ".last"):
                    path = cand + ".last"
            atoms = pqr_io.read_pqr(path, scale_charge=cfg.scale_charge)
            st, meta = build_state(atoms, basis)
            states.append(st)
        self.meta = meta
        self.stack = stack_states(states)

        cutoff = float(bead(self.stack, 0).pbc.cutoff)
        if not cfg.ewald_alpha_set:
            cfg.ewald_alpha = 3.5 / cutoff
        if not cfg.polar_ewald_alpha_set:
            cfg.polar_ewald_alpha = 3.5 / cutoff

        self.flags = cfg.to_flags()
        self.params = cfg.to_params()

        from .chain import MCOptions
        self.opts = _PIOpts(
            move_factor=cfg.move_factor,
            rot_factor=cfg.rot_factor,
            spinflip_probability=cfg.spinflip_probability,
            bead_perturb_probability=cfg.bead_perturb_probability,
            quantum_rotation=cfg.quantum_rotation,
            simulated_annealing=cfg.simulated_annealing,
            simulated_annealing_linear=cfg.simulated_annealing_linear,
            simulated_annealing_schedule=cfg.simulated_annealing_schedule,
            simulated_annealing_target=cfg.simulated_annealing_target,
            numsteps=cfg.numsteps,
        )

        # per-molecule-slot orientation specs from the sorbate registry
        M = self.stack.mol_alive.shape[1]
        mol_types = [meta["moleculetypes"][m] for m in range(M)]
        has, site, blen, rmass = [], [], [], []
        for t in mol_types:
            has.append(t in cfg.sorbate_orientation_site and
                       t in cfg.sorbate_bond_length)
            site.append(cfg.sorbate_orientation_site.get(t, 0))
            blen.append(cfg.sorbate_bond_length.get(t, 0.0))
            # keyword takes kg (sorbate_reducedMass, reference contract);
            # device math runs in amu
            rmass.append(cfg.sorbate_reduced_mass.get(t, 0.0) /
                         const.AMU2KG)
        self.perturb_specs = PerturbSpec(
            has_orientation=jnp.asarray(has),
            site_offset=jnp.asarray(site, jnp.int32),
            bond_length=jnp.asarray(blen),
            reduced_mass=jnp.asarray(rmass))

        mol_id = np.asarray(self.stack.mol_id[0])
        starts = np.zeros(M, dtype=np.int32)
        for m in range(M):
            w = np.nonzero(mol_id == m)[0]
            starts[m] = w[0] if len(w) else 0
        self.mol_atom_starts = jnp.asarray(starts)

        self.avg = AvgObservables()
        seed = cfg.preset_seed if cfg.preset_seed_on else 0
        self.key = jax.random.PRNGKey(seed)

        self.incremental = delta_mod.supports(self.flags)
        counts = np.bincount(np.asarray(self.stack.mol_id[0]), minlength=M)
        max_mol = int(counts.max())
        self.max_mol_atoms = max_mol
        any_orient = bool(np.asarray(
            self.perturb_specs.has_orientation).any())
        step_fn = make_pi_step(self.flags, self.params, self.opts,
                               self.perturb_specs, self.mol_atom_starts,
                               cfg.PI_trial_chain_length,
                               incremental=self.incremental,
                               max_mol_atoms=max_mol,
                               any_orientation=any_orient,
                               mol_atom_counts=counts)

        @jax.jit
        def run_chunk(carry, n_static=cfg.corrtime):
            return jax.lax.scan(step_fn, carry, None, length=n_static)
        self._run_chunk = run_chunk
        self._step_fn = step_fn

    @staticmethod
    def _basis(cfg):
        basis = np.zeros((3, 3))
        if cfg.basis1 and cfg.basis2 and cfg.basis3:
            basis[0], basis[1], basis[2] = cfg.basis1, cfg.basis2, cfg.basis3
        if np.linalg.det(basis) <= 0:
            raise ValueError("invalid simulation box dimensions")
        return basis

    def thermalize(self):
        """Initial whole-system bead perturbation
        (PI_perturb_bead_COMs_ENTIRE_SYSTEM, :1402-1449) with n = P."""
        P = self.P
        stack = self.stack
        movable = np.asarray(moves.movable_mask(bead(stack, 0)))
        starter = 0
        for m in np.nonzero(movable)[0]:
            self.key, k = jax.random.split(self.key)
            coms = mol_coms(stack)[:, int(m), :]
            mass = stack.mol_mass[0, int(m)]
            new_coms = coker_stage_coms(coms, k, P, starter, mass,
                                        self.cfg.temperature, P)
            delta = new_coms - coms
            sel = (stack.mol_id[0] == int(m))[None, :, None]
            pos = jnp.where(sel, stack.pos + delta[:, None, :], stack.pos)
            stack = stack.replace(pos=pos)
        self.stack = stack

    def _observables(self, carry) -> dict:
        comps = np.asarray(carry.obs_components)
        kinetic = float(pi_kinetic(carry.stack, carry.temperature))
        b0 = bead(carry.stack, 0)
        N = float(b0.count_N())
        spin = float(b0.spin_ratio_sum()) / max(N, 1.0)
        vol = float(b0.pbc.volume)
        total = float(comps.sum()) + kinetic
        mm = np.asarray(b0.mol_mass)
        alive = np.asarray(b0.mol_alive)
        frozen = np.asarray(b0.mol_frozen) | np.asarray(b0.mol_adiabatic)
        return {
            "energy": total,
            "rd_energy": float(comps[0]),
            "coulombic_energy": float(comps[1]),
            "polarization_energy": float(comps[2]),
            "vdw_energy": float(comps[3]),
            "kinetic_energy": kinetic,
            "temperature": float(carry.temperature),
            "N": N, "spin_ratio": spin, "volume": vol,
            "NU": N * total,
            "frozen_mass": float(mm[alive & frozen].sum()),
            "total_mass": float(mm[alive].sum()),
        }

    def run(self) -> AvgObservables:
        cfg = self.cfg
        if not cfg.parallel_restarts:
            self.thermalize()

        comps_pb, _ = pi_potential_per_bead(self.stack, self.flags,
                                            self.params)
        comps = jnp.mean(comps_pb, axis=0)
        pot = jnp.sum(comps)
        if self.incremental and delta_mod.uses_recip(self.flags):
            sf = pi_sf_compute(self.stack, self.flags, self.params)
        else:
            P_ = self.P
            sf = delta_mod.SFCache(jnp.zeros((P_, 0)), jnp.zeros((P_, 0)))

        carry = PICarry(
            stack=self.stack,
            potential_current=pot,
            obs_components=comps,
            comps_per_bead=comps_pb,
            sf=sf,
            temperature=jnp.asarray(cfg.temperature, jnp.float64),
            key=self.key,
            starter_bead=jnp.zeros((), jnp.int32),
            step=jnp.zeros((), jnp.int64),
            accept=jnp.zeros(7, jnp.int64),
            reject=jnp.zeros(7, jnp.int64),
            bf=jnp.zeros(()))

        if self.mesh is not None:
            from ..parallel import meshing
            carry = meshing.shard_pi_carry(carry, self.mesh, self.P)

        fp_energy = None
        fp_csv = None
        if cfg.energy_output and cfg.energy_output != "/dev/null":
            fp_energy = out_io.open_energy_file(cfg.energy_output)
        if cfg.energy_output_csv and cfg.energy_output_csv != "/dev/null":
            fp_csv = out_io.open_energy_file(cfg.energy_output_csv, csv=True)

        # all-bead XYZ frames (write_PI_frame, :699-729), enabled by -xyz
        frames = PIFrameWriter(getattr(self, "xyz_path", ""))

        perf = out_io.PerformanceTimer(cfg.numsteps)
        pmass = self._particle_mass(carry)

        def corrtime_io(step):
            obs = self._observables(carry)
            self.avg.update(obs, ensemble=cfg.ensemble,
                            temperature=cfg.temperature,
                            volume=obs["volume"], particle_mass=pmass,
                            free_volume=cfg.free_volume,
                            pressure=cfg.pressure)
            if fp_energy:
                out_io.write_observables(fp_energy, step, obs,
                                         float(carry.temperature))
            if fp_csv:
                out_io.write_observables(fp_csv, step, obs,
                                         float(carry.temperature), csv=True)

        corrtime_io(0)
        if not self.quiet:
            self.out.write("MC: initial values:\n")
            self._display(carry)

        step = 0
        while step < cfg.numsteps:
            n = min(cfg.corrtime, cfg.numsteps - step)
            carry, outs = self._run_chunk(carry) if n == cfg.corrtime else \
                jax.lax.scan(self._step_fn, carry, None, length=n)
            step += n
            if self.incremental:
                # full recompute each corrtime: Delta-E drift control
                comps_pb, _ = pi_potential_per_bead(carry.stack, self.flags,
                                                    self.params)
                comps = jnp.mean(comps_pb, axis=0)
                sf = pi_sf_compute(carry.stack, self.flags, self.params) \
                    if delta_mod.uses_recip(self.flags) else carry.sf
                carry = carry._replace(comps_per_bead=comps_pb,
                                       obs_components=comps,
                                       potential_current=jnp.sum(comps),
                                       sf=sf)
            ns = nodestats_from_counters(np.asarray(carry.accept),
                                         np.asarray(carry.reject),
                                         float(carry.bf))
            self.avg.update_nodestats(ns)
            corrtime_io(step)
            frames.write(carry.stack, self.meta)
            self._write_restarts(carry)
            if not self.quiet:
                perf.report(step, self.out)
                self._display(carry)

        self._write_finals(carry)
        pqr_io.drain()
        if fp_energy:
            fp_energy.close()
        if fp_csv:
            fp_csv.close()
        self.carry = carry
        return self.avg

    def _particle_mass(self, carry) -> float:
        b0 = bead(carry.stack, 0)
        mm = np.asarray(b0.mol_mass)
        mov = np.asarray(moves.movable_mask(b0))
        idx = np.nonzero(mov)[0]
        return float(mm[idx[0]]) if len(idx) else 0.0

    def _write_restarts(self, carry):
        if self.cfg.pqr_restart == "/dev/null":
            return
        for s in range(self.P):
            path = pqr_io.make_filename(self.cfg.pqr_restart, s)
            pqr_io.write_state_pqr(path, bead(carry.stack, s), self.meta,
                                   wrapall=self.cfg.wrapall,
                                   long_output=self.cfg.long_output)

    def _write_finals(self, carry):
        if self.cfg.pqr_output == "/dev/null":
            return
        for s in range(self.P):
            path = pqr_io.make_filename(self.cfg.pqr_output, s)
            pqr_io.write_state_pqr(path, bead(carry.stack, s), self.meta,
                                   wrapall=self.cfg.wrapall,
                                   long_output=self.cfg.long_output)

    def _display(self, carry):
        out_io.display_averages(
            self.avg, temperature=float(carry.temperature),
            simulated_annealing=self.cfg.simulated_annealing,
            ensemble=self.cfg.ensemble, out=self.out)


@dataclasses.dataclass(frozen=True)
class _PIOpts:
    move_factor: float = 1.0
    rot_factor: float = 1.0
    spinflip_probability: float = 0.0
    bead_perturb_probability: float = 0.0
    quantum_rotation: bool = False
    simulated_annealing: bool = False
    simulated_annealing_linear: bool = False
    simulated_annealing_schedule: float = 0.0
    simulated_annealing_target: float = 0.0
    numsteps: int = 0
