"""Two-box Gibbs (NVT) ensemble.

Coupled Markov chains over two boxes (SimulationControl.Gibbs.cpp:136-352):
particle transfers (remove from one box + insert a randomized copy into the
other) and coupled volume exchanges accept jointly; displacements/spinflips
accept per box (boltzmann_factor_NVT_Gibbs, src/SimulationControl.Gibbs.cpp:
358-524, pick_Gibbs_move src/System.MonteCarlo.cpp:509-714).

The two boxes may have different capacities, so the carry holds two separate
SystemState pytrees rather than a stacked axis.
"""

from __future__ import annotations

import dataclasses
import sys
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as const
from ..config.schema import SimConfig
from ..config.validate import validate
from ..flags import FFlags, RunParams
from ..io import output as out_io
from ..io import pqr as pqr_io
from ..ops import delta as delta_mod
from ..ops.energy import EnergyBreakdown, energy_breakdown
from ..state import SystemState, build_state
from . import chain as chain_mod
from . import moves
from .averages import AvgObservables, nodestats_from_counters


class GibbsCarry(NamedTuple):
    state_a: SystemState
    state_b: SystemState
    energy_a: jnp.ndarray
    energy_b: jnp.ndarray
    obs_a: chain_mod.Observables
    obs_b: chain_mod.Observables
    temperature: jnp.ndarray
    key: jnp.ndarray
    step: jnp.ndarray
    accept: jnp.ndarray   # [7]
    reject: jnp.ndarray
    sf_a: delta_mod.SFCache  # per-box Ewald structure factors ([0] dims
    sf_b: delta_mod.SFCache  # when the incremental path is off)
    recip_a: jnp.ndarray     # per-box current k-space energies (change
    recip_b: jnp.ndarray     # only on accept)


@dataclasses.dataclass(frozen=True)
class GibbsOptions:
    move_factor: float = 1.0
    rot_factor: float = 1.0
    spinflip_probability: float = 0.0
    volume_probability: float = 0.0
    transfer_probability: float = 0.0
    volume_change_factor: float = 0.25
    quantum_rotation: bool = False
    numsteps: int = 0
    # rect Delta-E per box for local moves (ops.delta); coupled volume
    # exchanges fall back to the full recompute
    incremental: bool = False
    max_mol_atoms: int = 1
    blocked_energy: bool = False


def make_gibbs_step(flags: FFlags, base_params: RunParams,
                    opts: GibbsOptions):

    def full_breakdown(state, params):
        if opts.blocked_energy:
            from ..ops.energy import energy_breakdown_blocked
            return energy_breakdown_blocked(state, flags, params)
        return energy_breakdown(state, flags, params)

    def energy_and_obs(state, params):
        eb = full_breakdown(state, params)
        obs = chain_mod.observables_from_breakdown(
            state, eb, flags, params, const.ENSEMBLE_NVT_GIBBS)
        return eb.total + eb.cavity_penalty, obs, eb.iterator_failed

    def step(carry: GibbsCarry, _):
        key, k_move, k_dir, ka1, ka2, kt1, kt2, kacc1, kacc2, kv = \
            jax.random.split(carry.key, 10)
        params = dataclasses.replace(base_params,
                                     temperature=carry.temperature)
        T = carry.temperature
        sa, sb = carry.state_a, carry.state_b

        ta, na = moves.pick_random_movable(sa, kt1)
        tb, nb = moves.pick_random_movable(sb, kt2)

        r = jax.random.uniform(k_move)
        spin_p = opts.spinflip_probability if opts.quantum_rotation else 0.0
        vol_p = opts.volume_probability + spin_p
        xfer_p = opts.transfer_probability + vol_p
        movetype = jnp.select(
            [r < spin_p, r < vol_p, r < xfer_p],
            [const.MOVETYPE_SPINFLIP, const.MOVETYPE_VOLUME,
             const.MOVETYPE_INSERT],  # INSERT encodes "transfer"
            const.MOVETYPE_DISPLACE)
        # direction of transfer: True = A->B
        a_to_b = jax.random.uniform(k_dir) < 0.5
        # never empty a box (src/System.MonteCarlo.cpp:655-661)
        would_empty = jnp.where(a_to_b, na <= 1, nb <= 1)
        movetype = jnp.where((movetype == const.MOVETYPE_INSERT) &
                             would_empty, const.MOVETYPE_DISPLACE, movetype)

        # --- build proposals for both boxes per movetype -----------------
        def do_displace(sa, sb):
            return (moves.displace(sa, ka1, ta, opts.move_factor,
                                   opts.rot_factor),
                    moves.displace(sb, ka2, tb, opts.move_factor,
                                   opts.rot_factor), jnp.asarray(True))

        def do_spin(sa, sb):
            return moves.spinflip(sa, ta), moves.spinflip(sb, tb), \
                jnp.asarray(True)

        slot_a = moves.find_dead_slot(sa, sa.mol_type[ta])
        slot_b = moves.find_dead_slot(sb, sb.mol_type[tb])

        def do_transfer(sa, sb):
            def a2b(_):
                nb_new, valid = moves.insert(sb, ka2, tb, slot_b)
                return moves.remove(sa, ta), nb_new, valid
            def b2a(_):
                na_new, valid = moves.insert(sa, ka1, ta, slot_a)
                return na_new, moves.remove(sb, tb), valid
            return jax.lax.cond(a_to_b, a2b, b2a, None)

        def do_volume(sa, sb):
            va, vb = sa.pbc.volume, sb.pbc.volume
            log_new = jnp.log(va) + (jax.random.uniform(kv) - 0.5) * \
                opts.volume_change_factor
            va_new = jnp.exp(log_new)
            vb_new = vb + va - va_new
            valid = vb_new > 0.0
            fa = (va_new / va) ** (1.0 / 3.0)
            fb = jnp.where(valid, (vb_new / vb) ** (1.0 / 3.0), 1.0)

            def scale(s, f):
                com = s.mol_com()
                delta = com * (f - 1.0)
                return s.replace(pos=s.pos + delta[s.mol_id],
                                 pbc=s.pbc.scale(f))
            return scale(sa, fa), scale(sb, fb), valid

        branch = jnp.select(
            [movetype == const.MOVETYPE_DISPLACE,
             movetype == const.MOVETYPE_SPINFLIP,
             movetype == const.MOVETYPE_INSERT], [0, 1, 2], 3)
        na_s, nb_s, valid = jax.lax.switch(
            branch,
            [lambda args: do_displace(*args), lambda args: do_spin(*args),
             lambda args: do_transfer(*args), lambda args: do_volume(*args)],
            (sa, sb))

        if opts.incremental:
            # rect Delta-E per box; coupled VOLUME moves fall back to the
            # full recompute (all pair distances change)
            is_xfer = movetype == const.MOVETYPE_INSERT
            mol_a = jnp.where(is_xfer & ~a_to_b, jnp.maximum(slot_a, 0), ta)
            mol_b = jnp.where(is_xfer & a_to_b, jnp.maximum(slot_b, 0), tb)
            rows_a = jnp.nonzero(sa.mol_id == mol_a,
                                 size=opts.max_mol_atoms, fill_value=-1)[0]
            rows_b = jnp.nonzero(sb.mol_id == mol_b,
                                 size=opts.max_mol_atoms, fill_value=-1)[0]

            def make_eval(old, sf, obs_prev, rows, recip_old):
                def eval_delta(ns):
                    d = delta_mod.delta_energy(old, ns, rows, sf, flags,
                                               params, recip_old=recip_old)
                    rd = obs_prev.rd_energy + d.d_rd
                    coul = obs_prev.coulombic_energy + d.d_coul
                    if flags.cavity_autoreject_absolute:
                        from ..ops.energy import cavity_absolute_check
                        from ..ops.pairwise import build_pairs_rect
                        ptr = build_pairs_rect(ns, flags, rows)
                        pen = cavity_absolute_check(ns, ptr, params)
                    else:
                        pen = jnp.zeros(())
                    return rd, coul, pen, d.sf_new, d.recip_new

                def eval_full(ns):
                    ebf = full_breakdown(ns, params)
                    if delta_mod.uses_recip(flags):
                        sf_new = delta_mod.sf_compute(ns, flags, params)
                        rec_new = delta_mod.recip_energy(sf_new, ns, flags,
                                                         params)
                    else:
                        sf_new, rec_new = sf, jnp.zeros(())
                    return (ebf.rd, ebf.coulombic, ebf.cavity_penalty,
                            sf_new, rec_new)

                def run(ns):
                    rd, coul, pen, sf_new, recip_new = jax.lax.cond(
                        movetype == const.MOVETYPE_VOLUME, eval_full,
                        eval_delta, ns)
                    ebk = EnergyBreakdown(
                        total=rd + coul, rd=rd, coulombic=coul,
                        polarization=jnp.zeros(()), vdw=jnp.zeros(()),
                        three_body=jnp.zeros(()), kinetic=jnp.zeros(()),
                        mu=old.mu * 0.0,
                        polarization_iterations=jnp.zeros(()),
                        iterator_failed=jnp.zeros((), bool),
                        dipole_rrms=jnp.zeros(()), cavity_penalty=pen)
                    obs = chain_mod.observables_from_breakdown(
                        ns, ebk, flags, params, const.ENSEMBLE_NVT_GIBBS)
                    return ebk.total + pen, obs, ebk.iterator_failed, \
                        sf_new, recip_new
                return run

            ea, obs_a, fail_a, sf_a_new, recip_a_new = make_eval(
                sa, carry.sf_a, carry.obs_a, rows_a, carry.recip_a)(na_s)
            eb_, obs_b, fail_b, sf_b_new, recip_b_new = make_eval(
                sb, carry.sf_b, carry.obs_b, rows_b, carry.recip_b)(nb_s)
        else:
            ea, obs_a, fail_a = energy_and_obs(na_s, params)
            eb_, obs_b, fail_b = energy_and_obs(nb_s, params)
            sf_a_new, sf_b_new = carry.sf_a, carry.sf_b
            recip_a_new, recip_b_new = carry.recip_a, carry.recip_b
        dEa = ea - carry.energy_a
        dEb = eb_ - carry.energy_b
        finite = jnp.isfinite(ea) & jnp.isfinite(eb_)
        beta = 1.0 / T

        # --- acceptance --------------------------------------------------
        pr_a = jnp.where(na_s.nuclear_spin[ta] == const.NUCLEAR_SPIN_PARA,
                         sa.rot_partfunc_g[ta] /
                         (sa.rot_partfunc_g[ta] + sa.rot_partfunc_u[ta]),
                         sa.rot_partfunc_u[ta] /
                         (sa.rot_partfunc_g[ta] + sa.rot_partfunc_u[ta]))
        pr_b = jnp.where(nb_s.nuclear_spin[tb] == const.NUCLEAR_SPIN_PARA,
                         sb.rot_partfunc_g[tb] /
                         (sb.rot_partfunc_g[tb] + sb.rot_partfunc_u[tb]),
                         sb.rot_partfunc_u[tb] /
                         (sb.rot_partfunc_g[tb] + sb.rot_partfunc_u[tb]))

        independent = (movetype == const.MOVETYPE_DISPLACE) | \
            (movetype == const.MOVETYPE_SPINFLIP)

        bf_a_ind = jnp.where(movetype == const.MOVETYPE_SPINFLIP, pr_a,
                             jnp.exp(-dEa / T))
        bf_b_ind = jnp.where(movetype == const.MOVETYPE_SPINFLIP, pr_b,
                             jnp.exp(-dEb / T))

        # transfer factor (src/SimulationControl.Gibbs.cpp:416-441):
        # (N_A/V_A)(V_B/(N_B+1)) exp(-beta(dE_A + dE_B)) with the
        # POST-move molecule counts, exactly as the reference evaluates it
        # (observables->N is refreshed by energy() before the factor).
        N_src = jnp.where(a_to_b, obs_a.N, obs_b.N)
        V_src = jnp.where(a_to_b, sa.pbc.volume, sb.pbc.volume)
        N_dst = jnp.where(a_to_b, obs_b.N, obs_a.N)
        V_dst = jnp.where(a_to_b, sb.pbc.volume, sa.pbc.volume)
        bf_xfer = (N_src / V_src) * (V_dst / (N_dst + 1.0)) * \
            jnp.exp(-beta * dEa - beta * dEb)

        # coupled volume factor. NOTE deliberate deviation: the reference's
        # algebra at src/SimulationControl.Gibbs.cpp:466-468 reduces to
        # (V_old/V_new)^N — the reciprocal of the detailed-balance-correct
        # Gibbs volume acceptance.  We use the standard form for a
        # log-uniform proposal in V_A (do_volume samples ln V_A, with
        # V_B = V_tot - V_A): the d(ln V_A) -> dV_A Jacobian adds one
        # power of (V_A'/V_A) on the sampled box only (Frenkel & Smit
        # alg. 18 has +1 on BOTH boxes because it samples ln(V_A/V_B)).
        # Physics-validated against published LJ coexistence densities
        # at 0.3-0.4 sigma (tools/gibbs_vle.py, README Fidelity).
        va, vb = sa.pbc.volume, sb.pbc.volume
        dV = na_s.pbc.volume - va
        bf_vol = ((va + dV) / va) ** (obs_a.N + 1.0) \
            * ((vb - dV) / vb) ** obs_b.N \
            * jnp.exp(-beta * dEa - beta * dEb)

        bf_joint = jnp.where(movetype == const.MOVETYPE_VOLUME, bf_vol,
                             bf_xfer)
        bf_joint = jnp.where(finite & valid, bf_joint, 0.0)

        u1 = jax.random.uniform(kacc1)
        u2 = jax.random.uniform(kacc2)
        acc_a_ind = (u1 < jnp.where(jnp.isfinite(ea), bf_a_ind, 0.0)) & \
            ~fail_a
        acc_b_ind = (u2 < jnp.where(jnp.isfinite(eb_), bf_b_ind, 0.0)) & \
            ~fail_b
        acc_joint = (u1 < bf_joint) & ~fail_a & ~fail_b

        acc_a = jnp.where(independent, acc_a_ind, acc_joint)
        acc_b = jnp.where(independent, acc_b_ind, acc_joint)

        sel = lambda acc, new, old: jax.tree_util.tree_map(
            lambda x, y: jnp.where(acc, x, y), new, old)
        state_a = sel(acc_a, na_s, sa)
        state_b = sel(acc_b, nb_s, sb)
        energy_a = jnp.where(acc_a, ea, carry.energy_a)
        energy_b = jnp.where(acc_b, eb_, carry.energy_b)
        obs_a_out = sel(acc_a, obs_a, carry.obs_a)
        obs_b_out = sel(acc_b, obs_b, carry.obs_b)
        sf_a_out = sel(acc_a, sf_a_new, carry.sf_a)
        sf_b_out = sel(acc_b, sf_b_new, carry.sf_b)
        recip_a_out = jnp.where(acc_a, recip_a_new, carry.recip_a)
        recip_b_out = jnp.where(acc_b, recip_b_new, carry.recip_b)

        accepted_any = acc_a | acc_b
        # report the transfer movetype as insert for stats purposes
        onehot = jax.nn.one_hot(movetype, 7, dtype=jnp.int64)
        return GibbsCarry(
            state_a, state_b, energy_a, energy_b, obs_a_out, obs_b_out,
            carry.temperature, key, carry.step + 1,
            carry.accept + jnp.where(accepted_any, onehot, 0),
            carry.reject + jnp.where(accepted_any, 0, onehot),
            sf_a_out, sf_b_out, recip_a_out, recip_b_out), \
            (jnp.where(independent, bf_a_ind, bf_joint), accepted_any,
             movetype)

    return step


class GibbsSimulation:
    """Host driver for NVT-Gibbs (Gibbs_mc,
    src/SimulationControl.Gibbs.cpp:136-352)."""

    def __init__(self, cfg: SimConfig, quiet: bool = False):
        self.cfg = validate(cfg)
        self.quiet = quiet
        self.out = sys.stdout

        basis = np.zeros((3, 3))
        basis[0], basis[1], basis[2] = cfg.basis1, cfg.basis2, cfg.basis3

        atoms_a = pqr_io.read_pqr(cfg.pqr_input,
                                  scale_charge=cfg.scale_charge)
        atoms_b = pqr_io.read_pqr(cfg.pqr_input_B or cfg.pqr_input,
                                  scale_charge=cfg.scale_charge)
        n_a = len({a.molecule_id for a in atoms_a if not a.frozen})
        n_b = len({a.molecule_id for a in atoms_b if not a.frozen})
        extra = max(n_a, n_b, 16)
        self.state_a, self.meta_a = build_state(atoms_a, basis,
                                                extra_mol_capacity=extra)
        self.state_b, self.meta_b = build_state(atoms_b, basis,
                                                extra_mol_capacity=extra)

        cutoff = float(self.state_a.pbc.cutoff)
        if not cfg.ewald_alpha_set:
            cfg.ewald_alpha = 3.5 / cutoff
        if not cfg.polar_ewald_alpha_set:
            cfg.polar_ewald_alpha = 3.5 / cutoff

        self.flags = cfg.to_flags()
        self.params = cfg.to_params()
        incremental = delta_mod.supports(self.flags)
        max_atoms = 1
        for st in (self.state_a, self.state_b):
            mid = np.asarray(st.mol_id)
            counts = np.bincount(mid, minlength=st.n_mol_slots)
            if len(counts):
                max_atoms = max(max_atoms, int(counts.max()))
        blocked = max(self.state_a.n_atom_slots,
                      self.state_b.n_atom_slots) > 1024 and not (
            self.flags.polarvdw or self.flags.using_axilrod_teller or
            self.flags.rd_crystal or self.flags.gwp or self.flags.spectre or
            self.flags.rd_anharmonic)
        self.opts = GibbsOptions(
            move_factor=cfg.move_factor, rot_factor=cfg.rot_factor,
            spinflip_probability=cfg.spinflip_probability,
            volume_probability=cfg.volume_probability,
            transfer_probability=cfg.transfer_probability,
            volume_change_factor=cfg.volume_change_factor,
            quantum_rotation=cfg.quantum_rotation,
            numsteps=cfg.numsteps,
            incremental=incremental, max_mol_atoms=max_atoms,
            blocked_energy=blocked)

        self.avg = [AvgObservables(), AvgObservables()]
        step_fn = make_gibbs_step(self.flags, self.params, self.opts)

        @jax.jit
        def run_chunk(carry):
            return jax.lax.scan(step_fn, carry, None, length=cfg.corrtime)
        self._run_chunk = run_chunk
        self._step_fn = step_fn
        self._seed = cfg.preset_seed if cfg.preset_seed_on else 0

        flags, params, opts = self.flags, self.params, self.opts

        @jax.jit
        def refresh(carry):
            """Per-corrtime drift control on the incremental path: full
            energy + structure-factor recompute (flag_all_pairs,
            src/System.cpp:1284-1297)."""
            def eo(state, sf):
                if opts.blocked_energy:
                    from ..ops.energy import energy_breakdown_blocked
                    eb = energy_breakdown_blocked(state, flags, params)
                else:
                    eb = energy_breakdown(state, flags, params)
                obs = chain_mod.observables_from_breakdown(
                    state, eb, flags, params, const.ENSEMBLE_NVT_GIBBS)
                if delta_mod.uses_recip(flags):
                    sf_new = delta_mod.sf_compute(state, flags, params)
                    recip = delta_mod.recip_energy(sf_new, state, flags,
                                                   params)
                else:
                    sf_new, recip = sf, jnp.zeros(())
                return eb.total + eb.cavity_penalty, obs, sf_new, recip
            ea, obs_a, sf_a, recip_a = eo(carry.state_a, carry.sf_a)
            eb_, obs_b, sf_b, recip_b = eo(carry.state_b, carry.sf_b)
            return carry._replace(energy_a=ea, energy_b=eb_, obs_a=obs_a,
                                  obs_b=obs_b, sf_a=sf_a, sf_b=sf_b,
                                  recip_a=recip_a, recip_b=recip_b)
        self._refresh = refresh

    def _init_carry(self) -> GibbsCarry:
        params = self.params
        flags = self.flags

        def eo(state):
            eb = energy_breakdown(state, flags, params)
            obs = chain_mod.observables_from_breakdown(
                state, eb, flags, params, const.ENSEMBLE_NVT_GIBBS)
            return eb.total + eb.cavity_penalty, obs

        ea, obs_a = eo(self.state_a)
        eb_, obs_b = eo(self.state_b)
        if self.opts.incremental and delta_mod.uses_recip(flags):
            sf_a = delta_mod.sf_compute(self.state_a, flags, params)
            sf_b = delta_mod.sf_compute(self.state_b, flags, params)
            recip_a = delta_mod.recip_energy(sf_a, self.state_a, flags,
                                             params)
            recip_b = delta_mod.recip_energy(sf_b, self.state_b, flags,
                                             params)
        else:
            sf_a = delta_mod.SFCache(jnp.zeros(0), jnp.zeros(0))
            sf_b = delta_mod.SFCache(jnp.zeros(0), jnp.zeros(0))
            recip_a = jnp.zeros(())
            recip_b = jnp.zeros(())
        return GibbsCarry(
            self.state_a, self.state_b, ea, eb_, obs_a, obs_b,
            jnp.asarray(self.cfg.temperature, jnp.float64),
            jax.random.PRNGKey(self._seed), jnp.zeros((), jnp.int64),
            jnp.zeros(7, jnp.int64), jnp.zeros(7, jnp.int64), sf_a, sf_b,
            recip_a, recip_b)

    def run(self):
        cfg = self.cfg
        carry = self._init_carry()

        fps = []
        for i in range(2):
            path = pqr_io.make_filename(cfg.energy_output, i) \
                if cfg.energy_output != "/dev/null" else None
            fps.append(out_io.open_energy_file(path) if path else None)

        def obs_dicts(carry):
            from .pi import bead  # noqa
            from ..runner import _obs_to_dict
            return [_obs_to_dict(carry.obs_a), _obs_to_dict(carry.obs_b)]

        def pmass(state):
            mm = np.asarray(state.mol_mass)
            mov = np.asarray(moves.movable_mask(state))
            idx = np.nonzero(mov)[0]
            return float(mm[idx[0]]) if len(idx) else 0.0

        def corrtime_io(step):
            for i, (obs, st) in enumerate(
                    zip(obs_dicts(carry),
                        (carry.state_a, carry.state_b))):
                self.avg[i].update(obs, ensemble=cfg.ensemble,
                                   temperature=cfg.temperature,
                                   volume=float(st.pbc.volume),
                                   particle_mass=pmass(st),
                                   free_volume=cfg.free_volume,
                                   pressure=cfg.pressure, gibbs=False)
                if fps[i]:
                    out_io.write_observables(fps[i], step, obs,
                                             float(carry.temperature))

        perf = out_io.PerformanceTimer(cfg.numsteps)
        corrtime_io(0)
        step = 0
        while step < cfg.numsteps:
            n = min(cfg.corrtime, cfg.numsteps - step)
            carry, _ = self._run_chunk(carry) if n == cfg.corrtime else \
                jax.lax.scan(self._step_fn, carry, None, length=n)
            step += n
            if self.opts.incremental:
                carry = self._refresh(carry)
            ns = nodestats_from_counters(np.asarray(carry.accept),
                                         np.asarray(carry.reject), 0.0)
            for i in range(2):
                self.avg[i].update_nodestats(ns)
            corrtime_io(step)
            if not self.quiet:
                perf.report(step, self.out)
                for i in range(2):
                    out_io.display_averages(
                        self.avg[i], sys_id=f"_{i}",
                        temperature=float(carry.temperature),
                        ensemble=cfg.ensemble, out=self.out)

        for i, (st, meta) in enumerate(((carry.state_a, self.meta_a),
                                        (carry.state_b, self.meta_b))):
            if cfg.pqr_output != "/dev/null":
                pqr_io.write_state_pqr(
                    pqr_io.make_filename(cfg.pqr_output, i), st, meta,
                    wrapall=cfg.wrapall, long_output=cfg.long_output)
        for f in fps:
            if f:
                f.close()
        self.carry = carry
        return self.avg
