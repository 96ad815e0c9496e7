"""Scan-driven Metropolis Markov chain.

The reference's serial per-step loop (System::mc,
src/System.MonteCarlo.cpp:20-134) becomes a jitted ``lax.scan`` over
``corrtime`` steps: move selection via ``lax.switch``, accept/reject as a
pytree select, RNG as threaded ``jax.random`` keys (replacing the twin
mt19937 streams, src/Rando.h:3-15 + src/System.h:607-610).

One compiled chunk per corrtime window; the host driver does the
once-per-corrtime bookkeeping (averages, file output) between chunks,
mirroring do_corrtime_bookkeeping (src/System.MonteCarlo.cpp:1902-2028).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import constants as const
from ..flags import FFlags, RunParams
from ..ops import delta as delta_mod
from ..ops import polar_cache as pcache_mod
from ..ops.energy import EnergyBreakdown, energy_breakdown
from ..state import Observables, SystemState
from . import cavity as cavity_mod
from . import metropolis, moves


@dataclasses.dataclass(frozen=True)
class MCOptions:
    """Static MC controls (hashable; part of the jit key)."""
    ensemble: int = const.ENSEMBLE_NVT
    move_factor: float = 1.0
    rot_factor: float = 1.0
    insert_probability: float = 0.0
    spinflip_probability: float = 0.0
    adiabatic_probability: float = 0.0
    volume_probability: float = 0.0
    volume_change_factor: float = 0.25
    fugacity: float = 0.0          # atm (resolved: EoS/user/pressure)
    sorbate_count: int = 1
    # multi-sorbate mixtures: insertion species are drawn uniformly from
    # ``insert_species`` (mol_type indices) — the insertion-list semantics
    # the reference's x sorbateCount factor assumes
    # (src/System.MonteCarlo.cpp:413-421; the list itself is vestigial in
    # this edition, src/System.cpp:480-489).  ``type_fugacities`` maps
    # mol_type index -> fugacity (atm) for per-species factors
    # (the fugacities[sorbateInsert] role, :1362-1367).
    insert_species: tuple = ()
    type_fugacities: tuple = ()
    quantum_rotation: bool = False
    simulated_annealing: bool = False
    simulated_annealing_linear: bool = False
    simulated_annealing_schedule: float = 0.0
    simulated_annealing_target: float = 0.0
    numsteps: int = 0
    cavity_bias: bool = False
    cavity_grid_size: int = 0
    cavity_radius: float = 0.0
    # accessible-volume darts per grid rebuild; the reference throws
    # volume/10 (update_cavity_volume, src/System.Cavity.cpp:122-133).
    # Static under jit, so the runner computes it from the initial volume.
    cavity_darts: int = 0
    spectre: bool = False
    spectre_max_charge: float = 0.0
    spectre_max_target: float = 0.0
    rd_anharmonic: bool = False
    gwp: bool = False
    gwp_probability: float = 0.0
    # incremental Delta-E evaluation (O(S*A) per local move) — enabled by
    # the driver when ops.delta.supports(flags); max_mol_atoms is the
    # static rect row count (largest movable molecule).
    incremental: bool = False
    max_mol_atoms: int = 1
    # incremental polarization: maintain the float32 SCF coefficient cache
    # + static field across moves (requires flags.polar_mixed; enabled by
    # the driver when ops.polar_cache.supports(flags))
    polar_incremental: bool = False
    # use the O(B*A) row-block tiling for full recomputes (init/refresh and
    # volume moves) — required above ~2k atoms where dense [A,A] tensors
    # would blow out HBM
    blocked_energy: bool = False


class NodeStats(NamedTuple):
    accept: jnp.ndarray            # [7] per-movetype accept counts
    reject: jnp.ndarray            # [7]
    boltzmann_factor: jnp.ndarray  # last BF


class MCCarry(NamedTuple):
    state: SystemState
    obs: Observables
    temperature: jnp.ndarray
    key: jnp.ndarray
    step: jnp.ndarray
    stats: NodeStats
    cavity: jnp.ndarray            # cavity grid open-fraction state [4]:
                                   # (per-step mean bias probability,
                                   #  cavity volume, corrtime snapshot of
                                   #  that mean, checkpoint count) — see
                                   # the step() comment for the
                                   # reference's two-tier averaging
    sf: delta_mod.SFCache          # Ewald structure-factor cache ([0] dims
                                   # when the incremental path is off)
    recip_e: jnp.ndarray           # current state's k-space energy (the
                                   # other half of the SF cache: it only
                                   # changes on accept)
    pcache: pcache_mod.PolarCache  # incremental polarization cache ([0]
                                   # dims when polar_incremental is off)


class StepOut(NamedTuple):
    boltzmann_factor: jnp.ndarray
    accepted: jnp.ndarray
    movetype: jnp.ndarray
    polarization_iterations: jnp.ndarray
    # an INSERT found no dead slot (fixed-capacity SoA, unlike the
    # reference's malloc): the move was force-rejected.  The host driver
    # discards the chunk, grows capacity, and re-runs so the ceiling
    # never biases the ensemble (runner.Simulation._grow_capacity).
    capacity_reject: jnp.ndarray


def observables_from_breakdown(state: SystemState, eb: EnergyBreakdown,
                               flags: FFlags, params: RunParams,
                               ensemble: int) -> Observables:
    """Mirror the observables updates inside System::energy()
    (src/System.Energy.cpp:150-163)."""
    N = state.count_N().astype(jnp.float64)
    spin = state.spin_ratio_sum() / jnp.where(N == 0, 1.0, N)
    obs = Observables(
        energy=eb.total,
        coulombic_energy=eb.coulombic,
        rd_energy=eb.rd,
        polarization_energy=eb.polarization,
        vdw_energy=eb.vdw,
        three_body_energy=eb.three_body,
        dipole_rrms=eb.dipole_rrms,
        kinetic_energy=eb.kinetic,
        temperature=jnp.zeros(()),
        volume=state.pbc.volume,
        N=N,
        NU=N * eb.total,
        spin_ratio=spin,
        frozen_mass=jnp.sum(jnp.where(
            state.mol_alive & (state.mol_frozen | state.mol_adiabatic),
            state.mol_mass, 0.0)),
        total_mass=jnp.sum(jnp.where(state.mol_alive, state.mol_mass, 0.0)),
    )
    if ensemble == const.ENSEMBLE_NVE:
        kin = params.total_energy - eb.total
        obs = dataclasses.replace(
            obs, kinetic_energy=kin,
            temperature=(2.0 / 3.0) * kin / jnp.where(N == 0, 1.0, N))
    return obs


def _pick_movetype(opts: MCOptions, state: SystemState, key, N_movable,
                   n_adiabatic):
    """Move selection per ensemble (do_checkpoint,
    src/System.MonteCarlo.cpp:318-454)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    r1 = jax.random.uniform(k1)
    r2 = jax.random.uniform(k2)
    r3 = jax.random.uniform(k3)
    r4 = jax.random.uniform(k4)
    ens = opts.ensemble

    def spin_or_displace(r):
        if opts.quantum_rotation:
            return jnp.where(r < opts.spinflip_probability,
                             const.MOVETYPE_SPINFLIP, const.MOVETYPE_DISPLACE)
        return jnp.asarray(const.MOVETYPE_DISPLACE)

    def displace_or_adiabatic(r):
        return jnp.where((n_adiabatic > 0) & (r < 0.5),
                         const.MOVETYPE_ADIABATIC, const.MOVETYPE_DISPLACE)

    if ens == const.ENSEMBLE_UVT:
        mv = jnp.where(
            r1 < opts.insert_probability,
            jnp.where(r2 < 0.5, const.MOVETYPE_INSERT, const.MOVETYPE_REMOVE),
            jnp.where(opts.quantum_rotation & (r3 < opts.spinflip_probability),
                      const.MOVETYPE_SPINFLIP, displace_or_adiabatic(r4)))
        # never remove the last molecule (src/System.MonteCarlo.cpp:449-454)
        mv = jnp.where((mv == const.MOVETYPE_REMOVE) & (N_movable <= 1),
                       spin_or_displace(r3), mv)
        return mv
    if ens in (const.ENSEMBLE_NVT, const.ENSEMBLE_NVE):
        return spin_or_displace(r1)
    if ens == const.ENSEMBLE_NPT:
        if opts.volume_probability == 0.0:
            return jnp.where(r1 < 1.0 / jnp.maximum(N_movable, 1),
                             const.MOVETYPE_VOLUME, const.MOVETYPE_DISPLACE)
        return jnp.where(r1 < opts.volume_probability,
                         const.MOVETYPE_VOLUME, const.MOVETYPE_DISPLACE)
    raise ValueError(f"unsupported ensemble for single-chain mc: {ens}")


def make_step_fn(flags: FFlags, base_params: RunParams, opts: MCOptions,
                 topology=None, stats_in_step: bool = True):
    """Build the per-step transition function for lax.scan.

    ``topology`` is an optional (mol_start[M], mol_natoms[M]) pair of host
    arrays (static molecule layout): when given, molecule addressing and
    local moves run as O(S) gathers/scatters instead of O(A) masked
    updates — the difference between ~4 ms and ~1 ms per step at 10k atoms.

    ``stats_in_step=False`` passes ``carry.stats`` through untouched; the
    caller is responsible for folding the scanned ``StepOut`` movetype/
    accepted/bf columns into NodeStats once per chunk
    (``accumulate_stats``) — a few [7]-int ops per move replaced by one
    vectorized [C,7] pass per chunk.  Nothing inside a chunk reads
    ``carry.stats``, so the chunk-end fold is observationally identical
    (asserted by the trajectory/stat identity tests).  Direct step users
    (parallel.replicas, __graft_entry__) keep the default.
    """
    if topology is not None:
        mol_start = jnp.asarray(topology[0], jnp.int32)
        mol_natoms = jnp.asarray(topology[1], jnp.int32)

        def rows_of(mol):
            off = jnp.arange(opts.max_mol_atoms, dtype=jnp.int32)
            rows = mol_start[mol] + off
            return jnp.where(off < mol_natoms[mol], rows, -1)
    else:
        rows_of = None

    # Statically-possible movetypes for this compiled config, and the
    # union of state fields their branches can mutate.  Pruning matters
    # twice on TPU: dead switch branches still compile, and EVERY field
    # any branch returns is copied into and out of the XLA conditional
    # each move (~1 us fixed cost per buffer — the full-state switch
    # profiled at 88-139 us/move as `conditional.14`).  The switch
    # therefore routes only the mutable-field diff; untouched fields
    # bypass it entirely (and the post-accept select over them folds
    # away, select(p,x,x) -> x).
    _possible = [const.MOVETYPE_DISPLACE]
    _diff_fields = ["pos"]
    if opts.ensemble == const.ENSEMBLE_UVT:
        _possible += [const.MOVETYPE_INSERT, const.MOVETYPE_REMOVE,
                      const.MOVETYPE_ADIABATIC]
        _diff_fields += ["mol_alive", "aalive", "nuclear_spin"]
    if opts.quantum_rotation and opts.ensemble in (
            const.ENSEMBLE_UVT, const.ENSEMBLE_NVT, const.ENSEMBLE_NVE):
        _possible.append(const.MOVETYPE_SPINFLIP)
        if "nuclear_spin" not in _diff_fields:
            _diff_fields.append("nuclear_spin")
    if opts.ensemble == const.ENSEMBLE_NPT:
        _possible.append(const.MOVETYPE_VOLUME)
        _diff_fields.append("pbc")
    if opts.spectre:
        _diff_fields.append("charge")
    if opts.gwp:
        _diff_fields.append("gwp_alpha")
    _possible = sorted(_possible)
    # movetype value -> branch position (identity fallback 0 for
    # impossible values; _pick_movetype never emits them)
    _branch_lut = jnp.asarray(
        [(_possible.index(m) if m in _possible else 0) for m in range(7)],
        jnp.int32)

    def apply_move(state: SystemState, key, movetype, target,
                   insert_com=None, insert_slot=None):
        k1, = jax.random.split(key, 1)

        def do_displace(s):
            if rows_of is not None and not (opts.rd_anharmonic or
                                            opts.spectre or opts.gwp):
                rows = rows_of(target)
                return moves.displace_rows(s, k1, rows, rows >= 0,
                                           opts.move_factor,
                                           opts.rot_factor), jnp.asarray(True)
            if opts.rd_anharmonic:
                return moves.displace_1d(s, k1, target, opts.move_factor), \
                    jnp.asarray(True)
            if opts.spectre:
                moved = moves.spectre_displace(
                    s, k1, target, opts.move_factor,
                    opts.spectre_max_charge, opts.spectre_max_target)
                # domain wrap after every SPECTRE move
                # (src/System.MonteCarlo.cpp:1183)
                return moves.spectre_wrapall(
                    moved, opts.spectre_max_target), jnp.asarray(True)
            if opts.gwp:
                # gwp molecules: displace with gwp_probability scale and
                # perturb widths (src/System.MonteCarlo.cpp:868-875)
                k1a, k1b = jax.random.split(k1)
                has_gwp = jnp.any((s.mol_id == target) & s.gwp_spin)
                scale = jnp.where(has_gwp, opts.gwp_probability,
                                  opts.move_factor)
                moved = moves.displace(s, k1a, target, scale,
                                       opts.rot_factor)
                widened = moves.displace_gwp(moved, k1b, target,
                                             opts.gwp_probability)
                out = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(has_gwp, a, b), widened, moved)
                return out, jnp.asarray(True)
            return moves.displace(s, k1, target, opts.move_factor,
                                  opts.rot_factor), jnp.asarray(True)

        def do_adiabatic(s):
            return moves.displace(s, k1, target, opts.adiabatic_probability,
                                  1.0), jnp.asarray(True)

        def do_insert(s):
            if rows_of is not None:
                return moves.insert_rows(
                    s, k1, rows_of(target),
                    rows_of(jnp.maximum(insert_slot, 0)),
                    rows_of(target) >= 0, insert_slot, insert_slot >= 0,
                    com=insert_com)
            return moves.insert(s, k1, target, insert_slot, com=insert_com)

        def do_remove(s):
            return moves.remove(s, target), jnp.asarray(True)

        def do_spinflip(s):
            return moves.spinflip(s, target), jnp.asarray(True)

        def do_volume(s):
            return moves.volume_change(s, k1, opts.volume_change_factor), \
                jnp.asarray(True)

        _by_movetype = {const.MOVETYPE_INSERT: do_insert,
                        const.MOVETYPE_REMOVE: do_remove,
                        const.MOVETYPE_DISPLACE: do_displace,
                        const.MOVETYPE_ADIABATIC: do_adiabatic,
                        const.MOVETYPE_SPINFLIP: do_spinflip,
                        const.MOVETYPE_VOLUME: do_volume}

        def _as_diff(fn):
            def g(s):
                ns, valid = fn(s)
                return tuple(getattr(ns, f) for f in _diff_fields), valid
            return g

        branches = [_as_diff(_by_movetype[m]) for m in _possible]
        if len(branches) == 1:
            diff, valid = branches[0](state)
        else:
            diff, valid = jax.lax.switch(_branch_lut[movetype], branches,
                                         state)
        return state.replace(**dict(zip(_diff_fields, diff))), valid

    def step(carry: MCCarry, _):
        key, k_move, k_target, k_apply, k_acc, k_cav = \
            jax.random.split(carry.key, 6)
        state = carry.state
        params = dataclasses.replace(base_params,
                                     temperature=carry.temperature)

        target, N_movable = moves.pick_random_movable(state, k_target)
        n_adiabatic = jnp.sum(state.mol_alive & state.mol_adiabatic)
        movetype = _pick_movetype(opts, state, k_move, N_movable, n_adiabatic)

        # ADIABATIC moves target an adiabatic molecule
        # (src/System.MonteCarlo.cpp:405-410)
        if opts.ensemble == const.ENSEMBLE_UVT:
            k_adia = jax.random.fold_in(k_target, 1)
            adia_mask = state.mol_alive & state.mol_adiabatic
            ka = jnp.floor(jax.random.uniform(k_adia) *
                           jnp.maximum(n_adiabatic, 1)).astype(jnp.int32)
            adia_target = moves.pick_kth_true(adia_mask, ka)
            target = jnp.where(movetype == const.MOVETYPE_ADIABATIC,
                               adia_target, target)

        # cavity-biased insertion machinery (src/System.Cavity.cpp;
        # src/System.MonteCarlo.cpp:731-764,838-843).  The grid is rebuilt
        # before every move as in the reference.  carry.cavity mirrors the
        # reference's two-tier averaging exactly: [0] the per-step running
        # mean of the grid open fraction (avg_nodestats, updated at the
        # END of each step — the acceptance factor therefore reads the
        # PRIOR value, as update_nodestats runs after boltzmann_factor in
        # the loop, src/System.MonteCarlo.cpp:95-104); [1] the current
        # dart-integrated accessible volume; [2] the per-corrtime
        # SNAPSHOT of [0] (avg_observables: clear_avg_nodestats resets
        # the checkpoint counter each corrtime so single-rank
        # update_root_nodestats copies verbatim, src/System.Averages.cpp
        # :361-380 + src/System.MonteCarlo.cpp:1984; advanced by
        # make_refresher), read only by the REMOVE biased flag; [3] the
        # checkpoint count.
        biased = jnp.asarray(False)
        cavity_prob_prior = jnp.zeros(())
        if opts.cavity_bias:
            k_grid, k_pick, k_rm = jax.random.split(k_cav, 3)
            info = cavity_mod.update_grid(state, opts.cavity_grid_size,
                                          opts.cavity_radius, k_grid,
                                          n_darts=opts.cavity_darts)
            ins_com, any_open = cavity_mod.biased_insert_position(info,
                                                                  k_pick)
            step_f = carry.step.astype(jnp.float64)
            cavity_prob_prior = carry.cavity[0]
            avg_prob = (cavity_prob_prior * step_f + info.probability) / \
                (step_f + 1.0)
            cavity_carry = jnp.stack([avg_prob, info.volume,
                                      carry.cavity[2], carry.cavity[3]])
            biased = jnp.select(
                [movetype == const.MOVETYPE_INSERT,
                 movetype == const.MOVETYPE_REMOVE],
                [any_open,
                 cavity_mod.remove_biased_flag(k_rm, carry.cavity[2],
                                               opts.cavity_grid_size)],
                False)
            insert_com = jnp.where(any_open, ins_com,
                                   moves.random_cell_position(state, k_pick))
        else:
            cavity_carry = carry.cavity
            insert_com = None

        if opts.sorbate_count > 1 and opts.insert_species:
            # mixture: draw the insertion species uniformly; the dead slot
            # doubles as the geometry template (slots keep their species
            # geometry through remove — only mol_alive flips)
            k_spec = jax.random.fold_in(k_target, 2)
            si = jnp.floor(jax.random.uniform(k_spec) *
                           opts.sorbate_count).astype(jnp.int32)
            ins_species = jnp.asarray(opts.insert_species, jnp.int32)[si]
            insert_slot = moves.find_dead_slot(state, ins_species)
            target = jnp.where(movetype == const.MOVETYPE_INSERT,
                               jnp.maximum(insert_slot, 0), target)
        else:
            insert_slot = moves.find_dead_slot(state,
                                               state.mol_type[target])
        new_state, valid = apply_move(state, k_apply, movetype, target,
                                      insert_com, insert_slot)
        v_old = state.pbc.volume

        if opts.incremental and opts.polar_incremental:
            # rect Delta-E + incremental polarization cache; full recompute
            # for VOLUME moves
            row_mol = jnp.where(movetype == const.MOVETYPE_INSERT,
                                jnp.maximum(insert_slot, 0), target)
            if rows_of is not None:
                rows = rows_of(row_mol)
            else:
                rows = jnp.nonzero(state.mol_id == row_mol,
                                   size=opts.max_mol_atoms, fill_value=-1)[0]

            def eval_delta_p(ns, with_commit=False):
                dres = delta_mod.delta_energy(state, ns, rows, carry.sf,
                                              flags, params,
                                              recip_old=carry.recip_e)
                rd = carry.obs.rd_energy + dres.d_rd
                coul = carry.obs.coulombic_energy + dres.d_coul
                # matrix-free proposal: the cached planes stay read-only
                # here; the commit below scatters in place post-decision
                pres = pcache_mod.polar_proposal(carry.pcache, state, ns,
                                                 rows, flags, params,
                                                 with_commit=with_commit)
                if with_commit:
                    pres, pcommit = pres
                else:
                    pcommit = None
                if flags.cavity_autoreject_absolute:
                    from ..ops.energy import cavity_absolute_check
                    from ..ops.pairwise import build_pairs_rect
                    ptr = build_pairs_rect(ns, flags, rows)
                    pen = cavity_absolute_check(ns, ptr, params)
                else:
                    pen = jnp.zeros(())
                out = (rd, coul, pres.energy, pres.mu, pres.iterations,
                       pres.iterator_failed, pres.dipole_rrms, pen,
                       dres.sf_new, dres.recip_new)
                return (out, pcommit) if with_commit else out

            def eval_full_p(ns):
                if opts.blocked_energy:
                    from ..ops.energy import energy_breakdown_blocked
                    ebf = energy_breakdown_blocked(ns, flags, params)
                else:
                    ebf = energy_breakdown(ns, flags, params)
                if delta_mod.uses_recip(flags):
                    sf_new = delta_mod.sf_compute(ns, flags, params)
                    recip_new = delta_mod.recip_energy(sf_new, ns, flags,
                                                       params)
                else:
                    sf_new, recip_new = carry.sf, jnp.zeros(())
                return (ebf.rd, ebf.coulombic, ebf.polarization, ebf.mu,
                        ebf.polarization_iterations, ebf.iterator_failed,
                        ebf.dipole_rrms, ebf.cavity_penalty, sf_new,
                        recip_new)

            # VOLUME moves exist only in NPT: keep the cond out of the
            # graph otherwise — a lax.cond on the carried [A,A] planes
            # blocks XLA's in-place buffer aliasing and forces full-plane
            # copies every step (measured ~15 ms/move at 10k atoms)
            if opts.ensemble == const.ENSEMBLE_NPT:
                (rd, coul, pol, mu, piters, pfail, prrms, pen, sf_new,
                 recip_new) = \
                    jax.lax.cond(movetype == const.MOVETYPE_VOLUME,
                                 eval_full_p, eval_delta_p, new_state)
                pcommit = None
            else:
                ((rd, coul, pol, mu, piters, pfail, prrms, pen, sf_new,
                  recip_new), pcommit) = eval_delta_p(new_state,
                                                      with_commit=True)
            pcache_rows = rows
            eb = EnergyBreakdown(
                total=rd + coul + pol, rd=rd, coulombic=coul,
                polarization=pol, vdw=jnp.zeros(()),
                three_body=jnp.zeros(()), kinetic=jnp.zeros(()),
                mu=mu, polarization_iterations=piters,
                iterator_failed=pfail, dipole_rrms=prrms,
                cavity_penalty=pen)
            new_state = new_state.replace(mu=mu)
        elif opts.incremental:
            # rect Delta-E path for local moves; full recompute for VOLUME
            row_mol = jnp.where(movetype == const.MOVETYPE_INSERT,
                                jnp.maximum(insert_slot, 0), target)
            if rows_of is not None:
                rows = rows_of(row_mol)
            else:
                rows = jnp.nonzero(state.mol_id == row_mol,
                                   size=opts.max_mol_atoms, fill_value=-1)[0]

            def eval_delta(ns):
                d = delta_mod.delta_energy(state, ns, rows, carry.sf,
                                           flags, params,
                                           recip_old=carry.recip_e)
                rd = carry.obs.rd_energy + d.d_rd
                coul = carry.obs.coulombic_energy + d.d_coul
                if flags.cavity_autoreject_absolute:
                    from ..ops.energy import cavity_absolute_check
                    from ..ops.pairwise import build_pairs_rect
                    ptr = build_pairs_rect(ns, flags, rows)
                    pen = cavity_absolute_check(ns, ptr, params)
                else:
                    pen = jnp.zeros(())
                return rd, coul, pen, d.sf_new, d.recip_new

            def eval_full(ns):
                if opts.blocked_energy:
                    from ..ops.energy import energy_breakdown_blocked
                    ebf = energy_breakdown_blocked(ns, flags, params)
                else:
                    ebf = energy_breakdown(ns, flags, params)
                if delta_mod.uses_recip(flags):
                    sf_new = delta_mod.sf_compute(ns, flags, params)
                    recip_new = delta_mod.recip_energy(sf_new, ns, flags,
                                                       params)
                else:
                    sf_new, recip_new = carry.sf, jnp.zeros(())
                return ebf.rd, ebf.coulombic, ebf.cavity_penalty, sf_new, \
                    recip_new

            if opts.ensemble == const.ENSEMBLE_NPT:
                rd, coul, pen, sf_new, recip_new = jax.lax.cond(
                    movetype == const.MOVETYPE_VOLUME, eval_full,
                    eval_delta, new_state)
            else:
                rd, coul, pen, sf_new, recip_new = eval_delta(new_state)
            pcache_new = carry.pcache
            total = rd + coul
            eb = EnergyBreakdown(
                total=total, rd=rd, coulombic=coul,
                polarization=jnp.zeros(()), vdw=jnp.zeros(()),
                three_body=jnp.zeros(()), kinetic=jnp.zeros(()),
                mu=state.mu * 0.0,
                polarization_iterations=jnp.zeros(()),
                iterator_failed=jnp.zeros((), bool),
                dipole_rrms=jnp.zeros(()), cavity_penalty=pen)
        else:
            if opts.blocked_energy:
                from ..ops.energy import energy_breakdown_blocked
                eb = energy_breakdown_blocked(new_state, flags, params)
            else:
                eb = energy_breakdown(new_state, flags, params)
            sf_new = carry.sf
            recip_new = carry.recip_e
            pcache_new = carry.pcache
            if flags.polarization:
                # keep converged dipoles on the state (dipole/field logs +
                # SCF warm starts)
                new_state = new_state.replace(mu=eb.mu)

        final_energy = eb.total + eb.cavity_penalty
        obs_after = observables_from_breakdown(new_state, eb, flags, params,
                                               opts.ensemble)

        initial_energy = carry.obs.energy
        delta = final_energy - initial_energy
        finite = jnp.isfinite(final_energy)

        # spin partition-function ratio for SPINFLIP factors
        pr = metropolis.spin_partfunc_ratio(
            new_state.nuclear_spin[target],
            state.rot_partfunc_g[target], state.rot_partfunc_u[target])

        T = carry.temperature
        if opts.ensemble == const.ENSEMBLE_UVT:
            if opts.sorbate_count > 1 and opts.type_fugacities:
                # per-species fugacity: for INSERT target is the slot
                # (whose mol_type IS the drawn species); for REMOVE the
                # removed molecule's own species
                fug_move = jnp.asarray(opts.type_fugacities)[
                    jnp.clip(state.mol_type[target], 0,
                             len(opts.type_fugacities) - 1)]
            else:
                fug_move = opts.fugacity
            bf = metropolis.uvt_factor(
                movetype, delta, T, state.pbc.volume, fug_move,
                obs_after.N, float(opts.sorbate_count),
                biased, cavity_carry[1], cavity_prob_prior, pr)
        elif opts.ensemble == const.ENSEMBLE_NPT:
            bf = metropolis.npt_factor(movetype, delta, T,
                                       base_params.pressure, v_old,
                                       new_state.pbc.volume, obs_after.N)
        elif opts.ensemble == const.ENSEMBLE_NVE:
            bf = metropolis.nve_factor(base_params.total_energy,
                                       initial_energy, final_energy,
                                       obs_after.N)
        else:
            bf = metropolis.nvt_factor(movetype, delta, T, pr)

        bf = jnp.where(finite & valid, bf, 0.0)
        accept = (jax.random.uniform(k_acc) < bf) & ~eb.iterator_failed

        sel = lambda a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(accept, x, y), a, b)
        state_out = sel(new_state, state)
        if opts.spectre:
            # reference restore semantics: a rejected SPECTRE move keeps
            # the renormalization shift it applied to the other spectre
            # sites (only the altered molecule is relinked from backup,
            # then renormalize runs again — src/System.MonteCarlo.cpp:
            # 1559-1582).  See moves.spectre_reject_restore.
            q_rej = moves.spectre_reject_restore(state, new_state, target)
            state_out = state_out.replace(
                charge=jnp.where(accept, new_state.charge, q_rej))
        obs_out = sel(obs_after, carry.obs)
        sf_out = sel(sf_new, carry.sf)
        recip_out = jnp.where(accept, recip_new, carry.recip_e)
        if opts.incremental and opts.polar_incremental:
            # commit the polarization cache to the SELECTED state: on
            # reject this rewrites the moved rows with their current
            # values (harmless, and it trims e_pair accumulation drift);
            # volume moves rebuild outright
            def commit_move(c):
                return pcache_mod.cache_move(c, state, state_out,
                                             pcache_rows, flags, params)

            def commit_volume(c):
                return pcache_mod.cache_init(state_out, flags, params)

            if opts.ensemble == const.ENSEMBLE_NPT:
                pcache_out = jax.lax.cond(
                    movetype == const.MOVETYPE_VOLUME, commit_volume,
                    commit_move, carry.pcache)
            else:
                # geometry-free commit from the proposal's own tables:
                # on reject every write re-writes current content
                pcache_out = pcache_mod.cache_commit(carry.pcache, accept,
                                                     pcommit, flags)
        else:
            pcache_out = sel(pcache_new, carry.pcache)

        # simulated annealing on accept (src/System.MonteCarlo.cpp:74-85)
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

        if stats_in_step:
            onehot = jax.nn.one_hot(movetype, 7, dtype=jnp.int64)
            stats = NodeStats(
                accept=carry.stats.accept + jnp.where(accept, onehot, 0),
                reject=carry.stats.reject + jnp.where(accept, 0, onehot),
                boltzmann_factor=bf,
            )
        else:
            stats = carry.stats

        out = StepOut(boltzmann_factor=bf, accepted=accept,
                      movetype=movetype,
                      polarization_iterations=eb.polarization_iterations,
                      capacity_reject=(movetype == const.MOVETYPE_INSERT) &
                                      (insert_slot < 0))
        return MCCarry(state_out, obs_out, T_out, key, carry.step + 1,
                       stats, cavity_carry, sf_out, recip_out,
                       pcache_out), out

    return step


def accumulate_stats(stats: NodeStats, outs: StepOut) -> NodeStats:
    """Fold a chunk's scanned StepOut columns into NodeStats — the
    chunk-end counterpart of make_step_fn(stats_in_step=False)."""
    hist = jax.nn.one_hot(outs.movetype, 7, dtype=jnp.int64)
    acc = jnp.sum(hist * outs.accepted[:, None].astype(jnp.int64), axis=0)
    return NodeStats(
        accept=stats.accept + acc,
        reject=stats.reject + (jnp.sum(hist, axis=0) - acc),
        boltzmann_factor=outs.boltzmann_factor[-1],
    )


def _carry_planes(carry: MCCarry):
    """The five (or fewer live) [A,A] polar-cache planes as a tuple —
    the dominant bytes crossing the chunk's jit boundary."""
    pc = carry.pcache
    return (pc.co, pc.cd, pc.dx, pc.dy, pc.dz)


def _carry_drop_planes(carry: MCCarry) -> MCCarry:
    """The carry with the [A,A] planes replaced by [0,0] placeholders
    (same dtype), so (planes, rest) round-trips losslessly."""
    pc = carry.pcache
    z = lambda a: jnp.zeros((0, 0), a.dtype)
    return carry._replace(pcache=pc._replace(
        co=z(pc.co), cd=z(pc.cd), dx=z(pc.dx), dy=z(pc.dy), dz=z(pc.dz)))


def _carry_with_planes(rest: MCCarry, planes) -> MCCarry:
    co, cd, dx, dy, dz = planes
    return rest._replace(pcache=rest.pcache._replace(
        co=co, cd=cd, dx=dx, dy=dy, dz=dz))


def make_chunk_runner(flags: FFlags, params: RunParams, opts: MCOptions,
                      chunk_steps: int, topology=None, donate=False):
    """Jitted corrtime-chunk: scan `chunk_steps` MC steps.

    ``donate=True`` donates the whole carry to the chunk so XLA aliases
    the big polar-cache planes in place at the jit boundary — otherwise
    every chunk call starts by copying them (~2.5 GB, ~8 ms at the
    flagship scale).  The caller must not touch the old carry
    afterwards.  NOTE: on the remote axon TPU backend donating the
    flagship-sized carry fails at dispatch with INVALID_ARGUMENT
    (measured, with and without the Pallas commit kernel), so nothing
    enables this there; it is kept for direct-attached TPU runtimes.

    ``donate="planes"`` donates ONLY the [A,A] polar-cache planes (~95%
    of the carry's bytes), split out as their own jit argument — a
    narrower shot at the same entry-copy savings that may dodge the axon
    dispatch failure above.  Semantically identical to the plain runner
    (tested trajectory-identical); the caller must still not reuse a
    consumed carry's plane buffers."""
    step = make_step_fn(flags, params, opts, topology=topology,
                        stats_in_step=False)

    if donate == "planes":
        @partial(jax.jit, donate_argnums=(0,))
        def run_split(planes, rest: MCCarry):
            carry2, outs = jax.lax.scan(step,
                                        _carry_with_planes(rest, planes),
                                        None, length=chunk_steps)
            carry2 = carry2._replace(
                stats=accumulate_stats(carry2.stats, outs))
            return _carry_planes(carry2), _carry_drop_planes(carry2), outs

        def run_chunk(carry: MCCarry):
            planes2, rest2, outs = run_split(_carry_planes(carry),
                                             _carry_drop_planes(carry))
            return _carry_with_planes(rest2, planes2), outs

        # profiling hook: lower the underlying jitted computation for a
        # given carry (tools/profile_chunk.py --dump-hlo)
        run_chunk.lower_hlo = lambda c: run_split.lower(
            _carry_planes(c), _carry_drop_planes(c))
        return run_chunk

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def run_chunk(carry: MCCarry):
        carry2, outs = jax.lax.scan(step, carry, None, length=chunk_steps)
        carry2 = carry2._replace(stats=accumulate_stats(carry2.stats, outs))
        return carry2, outs

    run_chunk.lower_hlo = run_chunk.lower
    return run_chunk


def init_carry(state: SystemState, flags: FFlags, params: RunParams,
               opts: MCOptions, seed: int) -> MCCarry:
    """Initial energy + carry (mc_initial_energy,
    src/System.MonteCarlo.cpp:158-173)."""
    if opts.blocked_energy:
        from ..ops.energy import energy_breakdown_blocked
        eb = jax.jit(lambda s: energy_breakdown_blocked(s, flags, params))(
            state)
    else:
        eb = energy_breakdown(state, flags, params)
    obs = observables_from_breakdown(state, eb, flags, params, opts.ensemble)
    obs = dataclasses.replace(
        obs, energy=jnp.where(jnp.isfinite(obs.energy), obs.energy,
                              const.MAXVALUE))
    stats = NodeStats(accept=jnp.zeros(7, jnp.int64),
                      reject=jnp.zeros(7, jnp.int64),
                      boltzmann_factor=jnp.zeros(()))
    if opts.incremental and delta_mod.uses_recip(flags):
        sf = delta_mod.sf_compute(state, flags, params)
        recip_e = delta_mod.recip_energy(sf, state, flags, params)
    else:
        sf = delta_mod.SFCache(jnp.zeros(0), jnp.zeros(0))
        recip_e = jnp.zeros(())
    if opts.incremental and opts.polar_incremental:
        pcache = jax.jit(lambda s: pcache_mod.cache_init(s, flags, params))(
            state)
    else:
        pcache = pcache_mod.empty_cache()
    return MCCarry(
        state=state, obs=obs,
        temperature=jnp.asarray(params.temperature, jnp.float64),
        key=jax.random.PRNGKey(seed),
        step=jnp.zeros((), jnp.int64),
        stats=stats,
        cavity=jnp.zeros(4),
        sf=sf,
        recip_e=recip_e,
        pcache=pcache,
    )


def make_refresher(flags: FFlags, base_params: RunParams, opts: MCOptions):
    """Jitted full-recompute of observables (and the structure-factor
    cache): the drift-control role of flag_all_pairs
    (src/System.cpp:1284-1297), invoked by the driver every corrtime."""

    @jax.jit
    def refresh(carry: MCCarry) -> MCCarry:
        params = dataclasses.replace(base_params,
                                     temperature=carry.temperature)
        if opts.blocked_energy:
            from ..ops.energy import energy_breakdown_blocked
            eb = energy_breakdown_blocked(carry.state, flags, params)
        else:
            eb = energy_breakdown(carry.state, flags, params)
        obs = observables_from_breakdown(carry.state, eb, flags, params,
                                         opts.ensemble)
        if opts.incremental and delta_mod.uses_recip(flags):
            sf = delta_mod.sf_compute(carry.state, flags, params)
            recip_e = delta_mod.recip_energy(sf, carry.state, flags,
                                             params)
        else:
            sf, recip_e = carry.sf, carry.recip_e
        if opts.incremental and opts.polar_incremental:
            pcache = pcache_mod.cache_init(carry.state, flags, params)
        else:
            pcache = carry.pcache
        cavity = carry.cavity
        if opts.cavity_bias:
            # refresh the avg_observables tier the REMOVE biased flag
            # reads: do_corrtime_bookkeeping clears the checkpoint
            # counter before re-averaging (clear_avg_nodestats,
            # src/System.MonteCarlo.cpp:1984), so with one rank
            # update_root_nodestats (src/System.Averages.cpp:361-380)
            # runs at m=1 and avg_observables is a per-corrtime SNAPSHOT
            # of the per-step running mean, not a checkpoint mean
            m = carry.cavity[3] + 1.0
            cavity = jnp.stack([carry.cavity[0], carry.cavity[1],
                                carry.cavity[0], m])
        return carry._replace(obs=obs, sf=sf, recip_e=recip_e,
                              pcache=pcache, cavity=cavity)

    return refresh
