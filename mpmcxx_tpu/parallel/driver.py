"""Replica-parallel simulation driver.

The runner-level equivalent of the reference's MPI operation: R independent
chains (optionally at a temperature ladder with parallel tempering) run as a
vmapped, mesh-sharded batch; every corrtime the host aggregates each
replica's observables into the root averages exactly as rank 0 does in
do_corrtime_bookkeeping (src/System.MonteCarlo.cpp:1954-2028), and writes
per-replica energy-log rows.

Parallel tempering follows the reference's (disabled) design
(src/System.MonteCarlo.cpp:1767-1897): neighbor-bath swaps every
``ptemp_freq`` steps exchanging temperatures, with observables collected
from the coldest bath.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

import os

from .. import constants as const
from ..config.schema import SimConfig
from ..io import histogram as hist_io
from ..io import output as out_io
from ..io import pqr as pqr_io
from ..mc import chain as chain_mod
from ..mc.averages import AvgObservables, nodestats_from_counters
from ..runner import Simulation, _obs_to_dict, apply_state_fixups
from ..state import build_state
from . import replicas as rep


class ReplicaSimulation:
    """R replica chains of a standard-ensemble run."""

    def __init__(self, cfg: SimConfig, n_replicas: int,
                 quiet: bool = False, mesh=None):
        self.base = Simulation(cfg, quiet=True)
        self.cfg = self.base.cfg
        self.R = n_replicas
        self.quiet = quiet
        self.out = sys.stdout
        self.mesh = mesh if mesh is not None else (
            rep.make_mesh(min(n_replicas, len(jax.devices())))
            if len(jax.devices()) > 1 else None)

        seed = cfg.preset_seed if cfg.preset_seed_on else 0
        self.carry = self._init_carries(n_replicas, seed)

        self.tempering = cfg.parallel_tempering
        if self.tempering:
            if cfg.max_temperature <= cfg.temperature:
                raise ValueError("parallel_tempering requires "
                                 "max_temperature > temperature")
            ladder = rep.temperature_ladder(cfg.temperature,
                                            cfg.max_temperature, n_replicas)
            self.carry = self.carry._replace(
                temperature=jnp.asarray(ladder))
            self.ptemp_freq = cfg.ptemp_freq or const.PTEMP_FREQ_DEFAULT
            chunk = min(self.ptemp_freq, cfg.corrtime)
        else:
            chunk = cfg.corrtime
        self.chunk = chunk

        self.runner = rep.make_replica_runner(
            self.base.flags, self.base.params, self.base.opts, chunk,
            mesh=self.mesh)
        self.refresh = jax.jit(jax.vmap(
            chain_mod.make_refresher(self.base.flags, self.base.params,
                                     self.base.opts)))
        self.avg = AvgObservables()
        self._swap_key = jax.random.PRNGKey(seed + 7919)
        self._parity = 0
        # tempering swap acceptance bookkeeping (the reference's design
        # tracks nothing here — its temper_system is dead code; counters
        # let users and tools/ptemp_validate.py check the ladder's health)
        self.swap_attempts = 0
        self.swap_accepts = 0

        # cross-replica population histogram + multi-sorbate roll-up: the
        # replica-axis role of the reference's per-corrtime MPI gather
        # (System.MPI.cpp:9-43 pack/unpack; update_root_histogram /
        # update_root_sorb_averages, System.MonteCarlo.cpp:1954-2028)
        self.hist = None
        if cfg.calc_hist:
            self.hist = hist_io.PopulationHistogram(
                np.asarray(self.base.state.pbc.basis), cfg.hist_resolution)
        self.sorbates = self.base.sorbates

    def _restart_path(self, r: int) -> str:
        """Per-replica resume search: restart-000r.pqr -> .last -> input.

        The reference performs this search only when ``parallel_restarts``
        is on (SimulationControl.cpp:2298-2355); without it every rank
        starts from pqr_input even if restart files from a previous run
        are sitting in the directory."""
        cfg = self.cfg
        if not cfg.parallel_restarts:
            return cfg.pqr_input
        if cfg.pqr_restart == "/dev/null":
            # restart output explicitly disabled: nothing to resume from
            return cfg.pqr_input
        base = cfg.pqr_restart if cfg.pqr_restart \
            else cfg.job_name + ".restart.pqr"
        cand = pqr_io.make_filename(base, r)
        if os.path.exists(cand):
            return cand
        if os.path.exists(cand + ".last"):
            return cand + ".last"
        return cfg.pqr_input

    def _init_carries(self, R: int, seed: int):
        """Per-replica initial carries: resume each replica from its own
        restart file when one exists (the reference's parallel_restarts
        role for MPI ranks), else broadcast the shared input state."""
        cfg = self.cfg
        paths = [self._restart_path(r) for r in range(R)]
        if all(p == cfg.pqr_input for p in paths):
            # slot layouts never change during a run (insert/remove only
            # flip mol_alive), so the shared base meta stays valid for
            # every replica (consumed by _grow_replica_capacity)
            self._replica_metas = [self.base.meta] * R
            return rep.replicate_carry(self.base.carry, R, base_seed=seed)

        atom_lists = {}
        for p in set(paths):
            atom_lists[p] = pqr_io.read_pqr(
                p, scale_charge=cfg.scale_charge,
                cdvdw_sig_repulsion=cfg.cdvdw_sig_repulsion,
                polarvdw=cfg.polarvdw,
                cdvdw_exp_repulsion=cfg.cdvdw_exp_repulsion)

        # one common PER-SPECIES slot reservation so the replica axis
        # stacks AND every insertable species keeps dead template slots
        # (a scalar extra replicates only the last movable molecule,
        # which silently starves the other species' insertions in
        # multi-sorbate uVT resumes — find_dead_slot returns -1 forever)
        basis = np.asarray(self.base.state.pbc.basis)

        def mov_by_species(atoms):
            out: dict = {}
            for a in atoms:
                if not a.frozen and not a.adiabatic and not a.target:
                    out.setdefault(a.moleculetype, set()).add(a.molecule_id)
            return {k: len(v) for k, v in out.items()}

        live_sp = {p: mov_by_species(atoms)
                   for p, atoms in atom_lists.items()}
        all_names = sorted({n for d in live_sp.values() for n in d})
        if len(all_names) > 1 or cfg.ensemble != const.ENSEMBLE_UVT:
            # per-species totals: max live across paths + headroom
            target_sp = {n: max(d.get(n, 0) for d in live_sp.values()) +
                         32 for n in all_names}
            for p, d in live_sp.items():
                missing = [n for n in all_names if d.get(n, 0) == 0]
                if missing and cfg.ensemble == const.ENSEMBLE_UVT:
                    raise ValueError(
                        f"replica restart {p} has no molecule of species "
                        f"{missing}: cannot reserve insertion templates "
                        "for a fully depleted species — restart from "
                        "pqr_input instead")

            def extra_of(p):
                return {n: target_sp[n] - live_sp[p].get(n, 0)
                        for n in all_names if n in live_sp[p]}
        else:
            n_mols = {p: len({a.molecule_id for a in atoms})
                      for p, atoms in atom_lists.items()}
            target = max(self.base.state.n_mol_slots,
                         max(n_mols.values()) + 32)

            def extra_of(p):
                return target - n_mols[p]

        carries = []
        states = {}
        metas = {}
        for r, p in enumerate(paths):
            if p not in states:
                st, meta = build_state(
                    atom_lists[p], basis,
                    extra_mol_capacity=extra_of(p),
                    species_names=list(self.base.meta["species"]))
                # same post-build fixups Simulation.__init__ applies
                # (pbc_cutoff override) so resumed replicas use the
                # same cutoff as fresh ones
                states[p] = apply_state_fixups(st, cfg)
                metas[p] = meta
            st = states[p]
            s0 = states[paths[0]]
            if st.n_atom_slots != s0.n_atom_slots or \
                    st.n_mol_slots != s0.n_mol_slots:
                raise ValueError(
                    f"replica {r} restart {p} does not stack with replica "
                    f"0 ({st.n_atom_slots} vs {s0.n_atom_slots} atom slots)")
            carries.append(chain_mod.init_carry(
                st, self.base.flags, self.base.params, self.base.opts,
                seed))
        self._replica_metas = [metas[p] for p in paths]
        carry_r = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *carries)
        keys = jax.vmap(lambda i: jax.random.fold_in(
            jax.random.PRNGKey(seed), i))(jnp.arange(R))
        return carry_r._replace(key=keys)

    def _grow_replica_capacity(self, base_carry_r) -> None:
        """Mid-run molecule-capacity restack for the replica batch.

        Same contract as runner.Simulation._grow_capacity: the chunk
        that hit the ceiling is discarded by the caller and re-run at
        the larger capacity, so saturation never biases any replica's
        ensemble.  Every replica regrows to a COMMON per-species slot
        total (stacking needs equal shapes; the step fn itself carries
        no static topology, so per-replica slot layouts may differ)."""
        from ..state import grow_mol_capacity
        cfg = self.cfg
        metas = self._replica_metas
        states = [jax.tree_util.tree_map(lambda x, rr=r: x[rr],
                                         base_carry_r.state)
                  for r in range(self.R)]
        name_of = {i: n for n, i in self.base.meta["species"].items()}
        insert_types = self.base._insert_types
        live = {t: [] for t in insert_types}
        for st in states:
            mt = np.asarray(st.mol_type)
            alive = np.asarray(st.mol_alive)
            mov = ~(np.asarray(st.mol_frozen) |
                    np.asarray(st.mol_adiabatic) |
                    np.asarray(st.mol_target))
            for t in insert_types:
                live[t].append(int((alive & mov & (mt == t)).sum()))
        target_total = {t: max(live[t]) + max(int(cfg.corrtime), 64)
                        for t in insert_types}
        new_metas, new_states = [], []
        st0 = None
        for r, (st, meta) in enumerate(zip(states, metas)):
            extra = {name_of[t]: target_total[t] - live[t][r]
                     for t in insert_types}
            ns, nm = grow_mol_capacity(
                st, meta, extra, ensure_species=tuple(extra),
                # mixed-SCF Pallas tiles want atom capacity % 512 == 0;
                # base_atoms is equal across replicas (common totals), so
                # the pad is too and the stack stays shape-consistent
                pad_atoms_multiple=512 if self.base.flags.polar_mixed
                else 0)
            if st0 is None:
                st0 = ns
            elif ns.n_atom_slots != st0.n_atom_slots or \
                    ns.n_mol_slots != st0.n_mol_slots:
                raise ValueError(
                    f"replica {r} regrew to {ns.n_atom_slots} atom slots "
                    f"vs replica 0's {st0.n_atom_slots}: replicas have "
                    "unequal non-insertable movable populations")
            new_metas.append(nm)
            new_states.append(ns)
        # the capacity-derived MCOptions fields (blocked_energy,
        # incremental-cache eligibility, max_mol_atoms) change with the
        # atom-slot count: recompute them and rebuild the jitted
        # runner/refresher closures around the new opts
        from ..runner import capacity_opts
        self.base.opts = capacity_opts(self.base.opts, self.base.flags,
                                       st0)
        self.runner = rep.make_replica_runner(
            self.base.flags, self.base.params, self.base.opts, self.chunk,
            mesh=self.mesh)
        self.refresh = jax.jit(jax.vmap(
            chain_mod.make_refresher(self.base.flags, self.base.params,
                                     self.base.opts)))
        carries = [chain_mod.init_carry(ns, self.base.flags,
                                        self.base.params, self.base.opts,
                                        0)
                   for ns in new_states]
        self._replica_metas = new_metas
        if not self.quiet:
            self.out.write(
                f"MC: replica molecule capacity grown to "
                f"{st0.n_mol_slots} slots ({st0.n_atom_slots} atom "
                f"slots)\n")
        carry_r = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                         *carries)
        self.carry = carry_r._replace(
            key=base_carry_r.key, step=base_carry_r.step,
            stats=base_carry_r.stats,
            temperature=base_carry_r.temperature,
            cavity=base_carry_r.cavity)
        if self.sorbates is not None:
            # per-slot masks resized (species indices unchanged; replica
            # 0's layout, matching the tracker's original base-layout
            # approximation for heterogeneous restarts)
            self.sorbates.mol_type = np.asarray(st0.mol_type)
            self.sorbates.movable = \
                ~np.asarray(st0.mol_frozen) & \
                ~np.asarray(st0.mol_adiabatic) & \
                ~np.asarray(st0.mol_target)

    def _corrtime_io(self, step: int, fp_energy):
        """Rank-0-style aggregation: average every replica's observables
        into the root statistics (coldest bath only under tempering)."""
        obs_b = self.carry.obs
        temps = np.asarray(self.carry.temperature)
        cold = int(np.argmin(temps))
        if self.hist is not None:
            self.hist.zero()
        for r in range(self.R):
            obs = {k: float(getattr(obs_b, k)[r])
                   for k in obs_b.__dataclass_fields__}
            if fp_energy:
                out_io.write_observables(fp_energy, step, obs,
                                         float(temps[r]))
            if not self.tempering or r == cold:
                self.avg.update(
                    obs, ensemble=self.cfg.ensemble,
                    temperature=self.cfg.temperature,
                    volume=obs["volume"],
                    particle_mass=self.base._particle_mass(),
                    free_volume=self.cfg.free_volume,
                    pressure=self.cfg.pressure)
                if self.hist is not None or self.sorbates is not None:
                    st = jax.tree_util.tree_map(lambda x: x[r],
                                                self.carry.state)
                    if self.hist is not None:
                        self.hist.accumulate(
                            np.asarray(st.mol_com()),
                            np.asarray(st.mol_frozen) |
                            ~np.asarray(st.mol_alive))
                    if self.sorbates is not None:
                        fug = (self.cfg.fugacities[0] if self.cfg.fugacities
                               else self.cfg.pressure)
                        self.sorbates.update(
                            np.asarray(st.mol_alive),
                            volume=float(st.pbc.volume),
                            frozen_mass=obs["frozen_mass"],
                            total_mass=obs["total_mass"],
                            free_volume=self.cfg.free_volume,
                            pressure_or_fugacity=fug,
                            temperature=self.cfg.temperature)
        if self.hist is not None:
            self.hist.update_root()
            if self.cfg.histogram_output and \
                    self.cfg.histogram_output != "/dev/null":
                with open(self.cfg.histogram_output, "w") as f:
                    self.hist.write_dx(f)

    def run(self) -> AvgObservables:
        cfg = self.cfg
        fp_energy = None
        if cfg.energy_output and cfg.energy_output != "/dev/null":
            fp_energy = out_io.open_energy_file(cfg.energy_output)

        perf = out_io.PerformanceTimer(cfg.numsteps)
        self._corrtime_io(0, fp_energy)

        step = 0
        since_corr = 0
        while step < cfg.numsteps:
            prev_carry = self.carry
            self.carry, stats = self.runner(self.carry)
            if cfg.ensemble == const.ENSEMBLE_UVT and \
                    bool(np.asarray(stats.capacity_reject).any()):
                # a replica's INSERT hit the capacity ceiling inside this
                # chunk: discard it, restack every replica at a larger
                # common capacity, and re-run the window (same contract
                # as runner.Simulation._grow_capacity)
                self._grow_replica_capacity(prev_carry)
                continue
            step += self.chunk
            since_corr += self.chunk

            if self.tempering:
                self._swap_key, k = jax.random.split(self._swap_key)
                new_t, swapped = rep.tempering_swap(
                    self.carry.temperature, self.carry.obs.energy, k,
                    self._parity)
                self.swap_attempts += sum(
                    1 for i in range(self.R - 1) if i % 2 == self._parity)
                self.swap_accepts += int(np.asarray(swapped).sum())
                self._parity ^= 1
                self.carry = self.carry._replace(temperature=new_t)

            if since_corr >= cfg.corrtime or step >= cfg.numsteps:
                since_corr = 0
                self.carry = self.refresh(self.carry)
                acc = np.asarray(self.carry.stats.accept).sum(axis=0)
                rej = np.asarray(self.carry.stats.reject).sum(axis=0)
                self.avg.update_nodestats(nodestats_from_counters(
                    acc, rej,
                    float(np.asarray(self.carry.stats.boltzmann_factor)[0]),
                    cavity_bias_probability=float(
                        np.asarray(self.carry.cavity)[:, 0].mean())
                    if cfg.cavity_bias else 0.0))
                self._corrtime_io(step, fp_energy)
                if cfg.pqr_restart != "/dev/null":
                    for r in range(self.R):
                        st = jax.tree_util.tree_map(lambda x: x[r],
                                                    self.carry.state)
                        pqr_io.write_state_pqr(
                            pqr_io.make_filename(cfg.pqr_restart, r), st,
                            self._replica_metas[r], wrapall=cfg.wrapall,
                            long_output=cfg.long_output)
                if not self.quiet:
                    perf.report(step, self.out)
                    out_io.display_averages(
                        self.avg,
                        temperature=float(
                            np.asarray(self.carry.temperature).min()),
                        ensemble=cfg.ensemble, out=self.out)

        if cfg.pqr_output != "/dev/null":
            for r in range(self.R):
                st = jax.tree_util.tree_map(lambda x: x[r],
                                            self.carry.state)
                pqr_io.write_state_pqr(
                    pqr_io.make_filename(cfg.pqr_output, r), st,
                    self._replica_metas[r], wrapall=cfg.wrapall,
                    long_output=cfg.long_output)
        pqr_io.drain()
        if fp_energy:
            fp_energy.close()
        return self.avg
