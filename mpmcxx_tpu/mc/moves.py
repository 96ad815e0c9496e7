"""Monte Carlo trial moves as pure state transforms.

Replaces make_move/checkpoint/restore (src/System.MonteCarlo.cpp:252-900,
1510-1727): instead of mutate-undo on linked lists, each move builds a new
SystemState; accept/reject selects between old and new pytrees.

Molecule targeting uses masks over the fixed molecule-slot axis; uVT
insertion/removal flips ``mol_alive`` on reserved template slots (the
insertion-list machinery of the reference is vestigial there —
src/System.cpp:480-489 is commented out — single-sorbate behavior is
preserved).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as const
from .. import quaternion as quat
from ..state import SystemState


class MoveProposal(NamedTuple):
    state: SystemState
    movetype: jnp.ndarray      # int32
    target_mol: jnp.ndarray    # int32 molecule slot acted on
    biased_move: jnp.ndarray   # bool (cavity-biased insertion)
    volume_old: jnp.ndarray    # for NPT factor
    valid: jnp.ndarray         # bool: move was applicable (e.g. slot free)


def movable_mask(state: SystemState):
    return state.mol_alive & ~(state.mol_frozen | state.mol_adiabatic |
                               state.mol_target)


def pick_kth_true(mask, k):
    """Index of the k-th True in mask (k in [0, count))."""
    cum = jnp.cumsum(mask.astype(jnp.int32))
    return jnp.argmax(cum == (k + 1))


def pick_random_movable(state: SystemState, key):
    mask = movable_mask(state)
    n = jnp.sum(mask)
    u = jax.random.uniform(key)
    k = jnp.floor(u * n).astype(jnp.int32)
    k = jnp.clip(k, 0, jnp.maximum(n - 1, 0))
    return pick_kth_true(mask, k), n


def _atoms_of(state: SystemState, mol):
    return state.mol_id == mol


def displace_rows(state: SystemState, key, rows, row_mask, move_factor,
                  rot_factor) -> SystemState:
    """Topology-window displace: O(S) slice/rotate/write on one molecule's
    contiguous atom rows instead of O(A) masked updates (single
    dynamic_slice/dynamic_update_slice — dynamic gathers/scatters lower to
    serial while loops on TPU at ~60 us apiece)."""
    from ..ops.pairwise import normalize_window, slice_rows, update_rows

    k1, k2, k3 = jax.random.split(key, 3)
    dice = jax.random.uniform(k1, (6,))
    trans = move_factor * dice[:3] * state.pbc.cutoff
    trans = jnp.where(dice[3:] < 0.5, -trans, trans)

    axis = jax.random.normal(k2, (3,))
    angle_deg = jax.random.uniform(k3) * 360.0 * rot_factor
    q = quat.from_axis_angle_deg(axis, angle_deg)

    S = rows.shape[0]
    start, _, mask_w = normalize_window(
        jnp.where(row_mask, rows, -1), state.n_atom_slots)
    pos_r = slice_rows(state.pos, start, S)              # [S,3]
    w = jnp.where(mask_w, slice_rows(state.mass, start, S), 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-300)
    com = jnp.sum(w[:, None] * pos_r, axis=0) / wsum
    new = quat.rotate(q, pos_r - com) + com + trans
    return state.replace(pos=update_rows(state.pos, start, new, mask_w))


def insert_rows(state: SystemState, key, tmpl_rows, slot_rows, row_mask,
                slot, valid, com=None):
    """Topology-window insertion (cf. insert()): contiguous-row slices +
    in-place block writes instead of gather/scatter."""
    from ..ops.pairwise import normalize_window, slice_rows, update_rows

    k_pos, k_axis, k_ang = jax.random.split(key, 3)
    A = state.n_atom_slots
    S = tmpl_rows.shape[0]
    t_start, _, t_mask = normalize_window(
        jnp.where(row_mask, tmpl_rows, -1), A)
    s_start, _, s_mask = normalize_window(
        jnp.where(row_mask, slot_rows, -1), A)

    new_com = random_cell_position(state, k_pos) if com is None else com
    tmpl_pos = slice_rows(state.pos, t_start, S)
    w = jnp.where(t_mask, slice_rows(state.mass, t_start, S), 0.0)
    wsum = jnp.maximum(jnp.sum(w), 1e-300)
    tmpl_com = jnp.sum(w[:, None] * tmpl_pos, axis=0) / wsum

    axis = jax.random.normal(k_axis, (3,))
    angle_deg = jax.random.uniform(k_ang) * 360.0
    q = quat.from_axis_angle_deg(axis, angle_deg)
    newpos = quat.rotate(q, tmpl_pos - tmpl_com) + new_com
    # template/slot windows can clip with different leading offsets at the
    # array tail (short molecules); realign window row k -> k
    t_off = jnp.clip(tmpl_rows[0], 0, A - 1).astype(jnp.int32) - t_start
    s_off = jnp.clip(slot_rows[0], 0, A - 1).astype(jnp.int32) - s_start
    newpos = jnp.roll(newpos, s_off - t_off, axis=0)
    pos = update_rows(state.pos, s_start, newpos, s_mask & valid)

    slot_c = jnp.maximum(slot, 0)
    alive = update_rows(state.mol_alive, slot_c,
                        jnp.where(valid, True, state.mol_alive[slot_c])[None])
    aalive = jnp.where((state.mol_id == slot_c) & valid, True, state.aalive)
    # the inserted copy inherits the template's nuclear spin (the reference
    # deep-copies the whole molecule, src/System.MonteCarlo.cpp:502)
    tmpl_mol = state.mol_id[jnp.clip(tmpl_rows[0], 0, A - 1)]
    spin = update_rows(state.nuclear_spin, slot_c,
                       jnp.where(valid, state.nuclear_spin[tmpl_mol],
                                 state.nuclear_spin[slot_c])[None])
    return state.replace(pos=pos, mol_alive=alive, aalive=aalive,
                         nuclear_spin=spin), valid


def displace(state: SystemState, key, mol, move_factor, rot_factor
             ) -> SystemState:
    """Random translation + quaternion rotation of one molecule
    (src/System.MonteCarlo.cpp:1226-1230, src/Molecule.cpp:128-206,286-321).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    dice = jax.random.uniform(k1, (6,))
    trans = move_factor * dice[:3] * state.pbc.cutoff
    trans = jnp.where(dice[3:] < 0.5, -trans, trans)

    axis = jax.random.normal(k2, (3,))
    angle_deg = jax.random.uniform(k3) * 360.0 * rot_factor
    q = quat.from_axis_angle_deg(axis, angle_deg)

    sel = _atoms_of(state, mol)[:, None]
    com = state.mol_com()[mol]
    rel = state.pos - com
    rotated = quat.rotate(q, rel) + com + trans
    return state.replace(pos=jnp.where(sel, rotated, state.pos))


def displace_1d(state: SystemState, key, mol, move_factor) -> SystemState:
    """1-D anharmonic displacement (src/System.MonteCarlo.cpp:1134-1147)."""
    k1, k2 = jax.random.split(key)
    trans = move_factor * jax.random.uniform(k1)
    trans = jnp.where(jax.random.uniform(k2) < 0.5, -trans, trans)
    sel = _atoms_of(state, mol)
    pos = state.pos.at[:, 0].add(jnp.where(sel, trans, 0.0))
    return state.replace(pos=pos)


def spinflip(state: SystemState, mol) -> SystemState:
    """(src/System.MonteCarlo.cpp:883-891)"""
    from ..ops.pairwise import update_rows
    cur = state.nuclear_spin[mol]
    new = jnp.where(cur == const.NUCLEAR_SPIN_PARA,
                    const.NUCLEAR_SPIN_ORTHO, const.NUCLEAR_SPIN_PARA)
    return state.replace(nuclear_spin=update_rows(
        state.nuclear_spin, jnp.asarray(mol, jnp.int32), new[None]))


def random_cell_position(state: SystemState, key):
    """Uniform position in the (centered) unit cell
    (src/System.MonteCarlo.cpp:766-775)."""
    from ..pbc import _mul3
    frac = 0.5 - jax.random.uniform(key, (3,))
    return _mul3(frac, state.pbc.basis)


def insert(state: SystemState, key, template_mol, dead_slot, com=None
           ) -> tuple[SystemState, jnp.ndarray]:
    """Insert a copy of ``template_mol``'s geometry at a random position and
    orientation into ``dead_slot`` (src/System.MonteCarlo.cpp:740-833).

    Returns (new_state, valid).  If no dead slot is available the state is
    returned unchanged with valid=False (capacity exhausted).
    """
    k_pos, k_axis, k_ang = jax.random.split(key, 3)
    valid = dead_slot >= 0
    slot = jnp.maximum(dead_slot, 0)

    new_com = random_cell_position(state, k_pos) if com is None else com

    # source geometry: the template molecule's atoms, gathered into the
    # slot's atom positions by intra-molecule atom ordering.  Slots cloned
    # from the template at build time have identical atom layout, so the
    # i-th atom of the slot corresponds to the i-th atom of the template.
    A = state.n_atom_slots
    arange = jnp.arange(A)
    tmpl_sel = state.mol_id == template_mol
    slot_sel = state.mol_id == slot
    # position of each atom within its molecule
    intra = arange - jnp.min(jnp.where(slot_sel, arange, A))
    tmpl_start = jnp.min(jnp.where(tmpl_sel, arange, A))
    src_idx = jnp.clip(tmpl_start + intra, 0, A - 1)

    tmpl_com = state.mol_com()[template_mol]
    rel = state.pos[src_idx] - tmpl_com

    axis = jax.random.normal(k_axis, (3,))
    angle_deg = jax.random.uniform(k_ang) * 360.0
    q = quat.from_axis_angle_deg(axis, angle_deg)
    newpos = quat.rotate(q, rel) + new_com

    pos = jnp.where((slot_sel & valid)[:, None], newpos, state.pos)
    alive = state.mol_alive.at[slot].set(
        jnp.where(valid, True, state.mol_alive[slot]))
    aalive = jnp.where(slot_sel & valid, True, state.aalive)
    spin = state.nuclear_spin.at[slot].set(
        jnp.where(valid, state.nuclear_spin[template_mol],
                  state.nuclear_spin[slot]))
    return state.replace(pos=pos, mol_alive=alive, aalive=aalive,
                         nuclear_spin=spin), valid


def find_dead_slot(state: SystemState, species):
    """First dead molecule slot of the given species, or -1."""
    dead = ~state.mol_alive & (state.mol_type == species) & \
        ~(state.mol_frozen | state.mol_adiabatic | state.mol_target)
    any_dead = jnp.any(dead)
    idx = jnp.argmax(dead)
    return jnp.where(any_dead, idx, -1)


def remove(state: SystemState, mol) -> SystemState:
    """(src/System.MonteCarlo.cpp:836-859)"""
    from ..ops.pairwise import update_rows
    mol = jnp.asarray(mol, jnp.int32)
    return state.replace(
        mol_alive=update_rows(state.mol_alive, mol,
                              jnp.zeros(1, dtype=bool)),
        aalive=jnp.where(state.mol_id == mol, False, state.aalive))


def volume_change(state: SystemState, key, volume_change_factor
                  ) -> SystemState:
    """Log-uniform volume move: scale basis, rescale molecule COMs rigidly
    (src/System.MonteCarlo.cpp:1235-1282)."""
    log_new = jnp.log(state.pbc.volume) + \
        (jax.random.uniform(key) - 0.5) * volume_change_factor
    new_volume = jnp.exp(log_new)
    factor = (new_volume / state.pbc.volume) ** (1.0 / 3.0)
    com = state.mol_com()
    delta = com * (factor - 1.0)
    pos = state.pos + delta[state.mol_id]
    return state.replace(pos=pos, pbc=state.pbc.scale(factor))


def spectre_displace(state: SystemState, key, mol, move_factor,
                     max_charge, max_target) -> SystemState:
    """SPECTRE move: random translation + charge perturbation +
    renormalisation (src/System.MonteCarlo.cpp:1152-1221).

    The reference redraws each charge delta from U[-1,1] until
    |q + dq| <= max_charge (the do/while at :1174-1176) — i.e. the
    accepted delta is uniform on [-1,1] ∩ [-max_charge-q, max_charge-q].
    We sample that conditional uniform directly in closed form: the
    per-move distribution is *identical* to the reference's rejection
    sampler (tests/test_mc.py::TestSpectreChargeLaw checks this against
    a literal numpy mirror of the C++ loop).
    """
    k1, k2 = jax.random.split(key, 2)
    dice = jax.random.uniform(k1, (6,))
    trans = move_factor * dice[:3] * max_target
    trans = jnp.where(dice[3:] < 0.5, -trans, trans)
    sel = _atoms_of(state, mol)
    pos = state.pos + jnp.where(sel[:, None], trans[None, :], 0.0)

    lo = jnp.maximum(-1.0, -max_charge - state.charge)
    hi = jnp.minimum(1.0, max_charge - state.charge)
    u = jax.random.uniform(k2, (state.n_atom_slots,))
    dq = lo + u * (hi - lo)
    q = state.charge + jnp.where(sel & state.spectre, dq, 0.0)
    charge = spectre_renormalize(state, q)
    return state.replace(pos=pos, charge=charge)


def displace_gwp(state: SystemState, key, mol, scale) -> SystemState:
    """Perturb gaussian-wave-packet widths of the molecule's gwp_spin atoms
    (Molecule::displace_gwp, src/Molecule.cpp:350-366); widths stay
    positive via abs."""
    u = jax.random.uniform(key, (state.n_atom_slots,))
    sel = _atoms_of(state, mol) & state.gwp_spin
    perturb = scale * (u - 0.5)
    new_alpha = jnp.abs(state.gwp_alpha + jnp.where(sel, perturb, 0.0))
    return state.replace(gwp_alpha=new_alpha)


def spectre_renormalize(state: SystemState, charge):
    """Spread residual charge over SPECTRE sites
    (src/System.MonteCarlo.cpp:1193-1221)."""
    sp = state.spectre & state.atom_alive()
    nsp = jnp.sum(sp)
    residual = jnp.sum(jnp.where(sp, charge, 0.0))
    frac = -residual / jnp.where(nsp == 0, 1.0, nsp)
    return jnp.where(sp, charge + frac, charge)


def spectre_reject_restore(state_old: SystemState, state_new: SystemState,
                           mol) -> jnp.ndarray:
    """Charge array after a REJECTED SPECTRE move, reference semantics.

    The reference's restore relinks only the altered molecule's backup and
    then renormalizes again (src/System.MonteCarlo.cpp:1559-1582): the
    renormalization shift the rejected proposal applied to every OTHER
    spectre site survives the restore.  Net effect per rejected move with
    n spectre sites and proposal delta d: the moved site leaks
    +d*(n-1)/n^2 and each other site -d/n^2 — rejected moves change the
    state, so the reference's SPECTRE chain is not reversible and its
    charges random-walk past spectre_max_charge (where its redraw
    do/while at :1174-1176 grinds toward a hang; observed live at step
    ~1750 of tools/spectre_crosscheck.py's toy).  We reproduce the leak
    exactly for parity; the hang cannot occur here because the
    closed-form conditional sampler never rejects.
    """
    moved = state_old.mol_id == mol
    q = jnp.where(moved, state_old.charge, state_new.charge)
    return spectre_renormalize(state_old, q)


def spectre_wrapall(state: SystemState, max_target) -> SystemState:
    """Pull SPECTRE charges into the restricted cubic domain of side
    2*spectre_max_target around the target particle
    (src/System.cpp:1302-1342; the reference's atom loop leaves the LAST
    target-flagged atom as the wrap center)."""
    sidelen = 2.0 * max_target
    tgt = state.target & state.atom_alive()
    # last target-flagged atom, as in the reference's overwrite loop
    idx_last = jnp.max(jnp.where(tgt, jnp.arange(state.n_atom_slots), -1))
    center = jnp.where(jnp.any(tgt),
                       state.pos[jnp.maximum(idx_last, 0)],
                       jnp.zeros(3))
    d = state.pos - center[None, :]
    wrapped = state.pos - sidelen * jnp.round(d / sidelen)
    pos = jnp.where(state.spectre[:, None], wrapped, state.pos)
    return state.replace(pos=pos)
