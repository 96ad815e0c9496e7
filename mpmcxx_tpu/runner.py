"""Simulation controller: config -> state -> Markov chain -> outputs.

The front-end role of SimulationControl (src/SimulationControl.cpp:37-129,
runSimulation :2853-2971): parse + validate input, build the system, run the
selected ensemble loop, and do per-corrtime bookkeeping (averages, energy
log, restart/trajectory files), matching the reference's file contract.
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import numpy as np

from . import constants as const
from .config.parser import read_config
from .config.schema import SimConfig
from .config.validate import validate
from .io import histogram as hist_io
from .io import output as out_io
from .io import pqr as pqr_io
from .io import trajectory as traj_io
from .mc import chain as chain_mod
from .mc.averages import AvgObservables, nodestats_from_counters
from .mc.sorbate import SorbateTracker
from .ops import delta as delta_mod
from .state import build_state, grow_mol_capacity, topology


def _obs_to_dict(obs) -> dict:
    return {f.name: float(getattr(obs, f.name))
            for f in dataclasses.fields(obs)}


def apply_state_fixups(state, cfg: SimConfig):
    """Post-build_state config overrides that every constructed state
    (fresh, restart-resumed, per-replica) must receive identically —
    currently the manual cutoff (pbc_cutoff keyword,
    src/SimulationControl.cpp:1204-1208; update_pbc keeps it)."""
    if cfg.pbc_cutoff > 0.0:
        state = state.replace(
            pbc=dataclasses.replace(
                state.pbc, cutoff=jax.numpy.asarray(cfg.pbc_cutoff)))
    return state


def capacity_opts(opts, flags, state):
    """Recompute the capacity-derived MCOptions fields after a state
    rebuild — the same derivation Simulation.__init__ does.  Shared by
    the single-system and replica capacity regrowth paths (blocked_energy
    and the incremental-cache eligibility are functions of the atom-slot
    count: a regrow can cross the dense->blocked threshold or exit
    polar_cache.supports()' memory cap)."""
    mol_id = np.asarray(state.mol_id)
    counts = np.bincount(mol_id, minlength=state.n_mol_slots)
    from .ops import polar_cache as pcache_mod
    polar_incremental = pcache_mod.supports(flags, state.n_atom_slots)
    incremental = delta_mod.supports(flags) or polar_incremental
    blocked = state.n_atom_slots > 1024 and not (
        flags.polarvdw or flags.using_axilrod_teller or
        flags.rd_crystal or flags.gwp or flags.spectre or
        flags.rd_anharmonic)
    return dataclasses.replace(
        opts, incremental=incremental,
        polar_incremental=polar_incremental, blocked_energy=blocked,
        max_mol_atoms=int(counts.max()) if len(counts) else 1)


class Simulation:
    """One standard-ensemble run (NVT / uVT / NPT / NVE)."""

    def __init__(self, cfg: SimConfig, quiet: bool = False,
                 uvt_capacity_factor: float = 2.0, mesh=None):
        """``mesh``: optional jax.sharding.Mesh; row-shards the polar
        cache's [A,A] SCF planes over its devices (parallel/meshing.py)
        so the O(A^2) per-move work splits across chips.  Requires the
        polar-incremental path; trajectory is bit-identical to
        single-device (tests/test_multichip_drivers.py)."""
        self.cfg = validate(cfg)
        self.quiet = quiet
        self.mesh = mesh
        self.out = sys.stdout

        atoms = pqr_io.read_pqr(
            cfg.pqr_input, scale_charge=cfg.scale_charge,
            cdvdw_sig_repulsion=cfg.cdvdw_sig_repulsion,
            polarvdw=cfg.polarvdw,
            cdvdw_exp_repulsion=cfg.cdvdw_exp_repulsion)

        basis = self._resolve_basis(cfg)
        extra = 0
        if cfg.ensemble == const.ENSEMBLE_UVT:
            mov_by_species: dict = {}
            for a in atoms:
                if not a.frozen and not a.adiabatic and not a.target:
                    mov_by_species.setdefault(a.moleculetype,
                                              set()).add(a.molecule_id)
            if len(mov_by_species) > 1:
                # mixture: per-species dead-slot headroom
                extra = {mt: max(int(len(ids) * (uvt_capacity_factor - 1.0)),
                                 32)
                         for mt, ids in mov_by_species.items()}
            else:
                n_mov = len({a.molecule_id for a in atoms if not a.frozen})
                extra = max(int(n_mov * (uvt_capacity_factor - 1.0)), 32)

        self.state, self.meta = build_state(
            atoms, basis, extra_mol_capacity=extra)

        # manual cutoff override (pbc_cutoff keyword,
        # src/SimulationControl.cpp:1204-1208; update_pbc keeps it)
        self.state = apply_state_fixups(self.state, cfg)

        # ewald alpha defaults to 3.5/cutoff unless user-set
        # (src/System.cpp:871-874)
        cutoff = float(self.state.pbc.cutoff)
        if not cfg.ewald_alpha_set:
            cfg.ewald_alpha = 3.5 / cutoff
        if not cfg.polar_ewald_alpha_set:
            cfg.polar_ewald_alpha = 3.5 / cutoff

        self.flags = cfg.to_flags()
        self.params = cfg.to_params()

        # initial SPECTRE domain wrap (src/SimulationControl.cpp:192)
        if cfg.spectre:
            from .mc import moves as moves_mod
            self.state = moves_mod.spectre_wrapall(self.state,
                                                   cfg.spectre_max_target)

        # incremental Delta-E stepping whenever the energy is pairwise
        mol_id = np.asarray(self.state.mol_id)
        counts = np.bincount(mol_id, minlength=self.state.n_mol_slots)
        max_mol_atoms = int(counts.max()) if len(counts) else 1
        flags0 = cfg.to_flags()
        from .ops import polar_cache as pcache_mod
        polar_incremental = pcache_mod.supports(flags0,
                                                self.state.n_atom_slots)
        incremental = delta_mod.supports(flags0) or polar_incremental
        blocked = self.state.n_atom_slots > 1024 and not (
            flags0.polarvdw or flags0.using_axilrod_teller or
            flags0.rd_crystal or flags0.gwp or flags0.spectre or
            flags0.rd_anharmonic)

        fug = cfg.fugacities[0] if cfg.fugacities else cfg.pressure

        # multi-sorbate mixtures: uniform-species insertion with
        # per-species fugacities (fugacities[sorbateInsert],
        # src/System.MonteCarlo.cpp:1362-1367; sorbate order = order of
        # first appearance, count_sorbates src/System.cpp:1555)
        mt_arr = np.asarray(self.state.mol_type)
        mov_mask = (np.asarray(self.state.mol_alive) &
                    ~np.asarray(self.state.mol_frozen) &
                    ~np.asarray(self.state.mol_adiabatic) &
                    ~np.asarray(self.state.mol_target))
        sorb_types = sorted(set(mt_arr[mov_mask].tolist()))
        self._insert_types = tuple(sorb_types)
        sorbate_count = max(len(sorb_types), 1)
        insert_species: tuple = ()
        type_fugacities: tuple = ()
        if sorbate_count > 1:
            insert_species = tuple(int(t) for t in sorb_types)
            tf = [0.0] * len(self.meta["species"])
            for i, t in enumerate(sorb_types):
                if cfg.user_fugacities and \
                        len(cfg.fugacities) >= sorbate_count:
                    tf[t] = cfg.fugacities[i]
                else:
                    tf[t] = fug
            type_fugacities = tuple(tf)

        self.opts = chain_mod.MCOptions(
            ensemble=cfg.ensemble,
            move_factor=cfg.move_factor,
            rot_factor=cfg.rot_factor,
            insert_probability=cfg.insert_probability,
            spinflip_probability=cfg.spinflip_probability,
            adiabatic_probability=cfg.adiabatic_probability,
            volume_probability=cfg.volume_probability,
            volume_change_factor=cfg.volume_change_factor,
            fugacity=fug,
            sorbate_count=sorbate_count,
            insert_species=insert_species,
            type_fugacities=type_fugacities,
            quantum_rotation=cfg.quantum_rotation,
            simulated_annealing=cfg.simulated_annealing,
            simulated_annealing_linear=cfg.simulated_annealing_linear,
            simulated_annealing_schedule=cfg.simulated_annealing_schedule,
            simulated_annealing_target=cfg.simulated_annealing_target,
            numsteps=cfg.numsteps,
            spectre=cfg.spectre,
            spectre_max_charge=cfg.spectre_max_charge,
            spectre_max_target=cfg.spectre_max_target,
            rd_anharmonic=cfg.rd_anharmonic,
            gwp=cfg.gwp,
            gwp_probability=cfg.gwp_probability,
            cavity_bias=cfg.cavity_bias,
            cavity_grid_size=cfg.cavity_grid_size,
            cavity_radius=cfg.cavity_radius,
            # volume/10 darts (src/System.Cavity.cpp:131); static under
            # jit, so sized from the initial volume
            cavity_darts=max(int(float(self.state.pbc.volume) * 0.1), 1)
            if cfg.cavity_bias else 0,
            incremental=incremental,
            max_mol_atoms=max_mol_atoms,
            polar_incremental=polar_incremental,
            blocked_energy=blocked,
        )

        self.avg = AvgObservables()
        # multi-sorbate stats when >1 movable species present
        mt = np.asarray(self.state.mol_type)
        mmass = np.asarray(self.state.mol_mass)
        mov = ~np.asarray(self.state.mol_frozen) & \
            ~np.asarray(self.state.mol_adiabatic) & \
            ~np.asarray(self.state.mol_target)
        self.sorbates = SorbateTracker(self.meta["species"], mt, mmass, mov)
        if self.sorbates.count <= 1:
            self.sorbates = None
        seed = cfg.preset_seed if cfg.preset_seed_on else 0
        self.carry = chain_mod.init_carry(self.state, self.flags, self.params,
                                          self.opts, seed)
        if mesh is not None:
            if not self.opts.polar_incremental:
                raise ValueError(
                    "mesh sharding requires the polar-incremental cache "
                    "(polarization + polar_mixed); this config has no "
                    "[A,A] planes to shard")
            from .parallel import meshing
            self.carry = meshing.shard_chain_carry(self.carry, mesh)
        self.topology = topology(self.state)
        # planes-only donation: only the [A,A] polar-cache planes are
        # consumed at the jit boundary (never read host-side; the
        # regrowth/refresh/report paths touch state + small leaves
        # only), killing the per-chunk plane entry copies.  Whole-carry
        # donation stays off: Simulation keeps host-side reads of
        # self.state's buffers alive across chunks (_particle_mass,
        # dipole reporting).  Off under a mesh: donating device_put
        # sharded buffers is untested on the axon runtime.
        self._donate = "planes" if (self.opts.polar_incremental and
                                    mesh is None) else False
        self.run_chunk = chain_mod.make_chunk_runner(
            self.flags, self.params, self.opts, cfg.corrtime,
            topology=self.topology, donate=self._donate)
        self.refresh = chain_mod.make_refresher(self.flags, self.params,
                                                self.opts)

    @staticmethod
    def _resolve_basis(cfg: SimConfig) -> np.ndarray:
        basis = np.zeros((3, 3))
        if cfg.basis1 and cfg.basis2 and cfg.basis3:
            basis[0] = cfg.basis1
            basis[1] = cfg.basis2
            basis[2] = cfg.basis3
        if cfg.read_pqr_box:
            b = pqr_io.read_pqr_box(cfg.pqr_input)
            if b is not None:
                basis = b
        if np.linalg.det(basis) <= 0:
            raise ValueError("invalid simulation box dimensions")
        return basis

    def _particle_mass(self) -> float:
        mm = np.asarray(self.state.mol_mass)
        mov = np.asarray(self.state.mol_alive) & \
            ~np.asarray(self.state.mol_frozen) & \
            ~np.asarray(self.state.mol_adiabatic)
        idx = np.nonzero(mov)[0]
        return float(mm[idx[0]]) if len(idx) else 0.0

    # -- uVT molecule-capacity regrowth -------------------------------
    #
    # The reference mallocs on every insertion
    # (src/System.MonteCarlo.cpp:740-833); our SoA pytree is statically
    # sized, so a run whose equilibrium N outgrows the initial headroom
    # would silently saturate: INSERTs force-reject once no dead slot of
    # the species remains (found by tools/uvt_crosscheck.py — N pinned
    # at capacity while the reference climbed past it).  Two defenses:
    # a proactive regrow when any insertable species' headroom drops
    # below a quarter-corrtime of slots, and a reactive one — the chunk
    # that hit the ceiling is DISCARDED and re-run at the larger
    # capacity, so the ceiling never biases the sampled ensemble.

    def _dead_counts(self, state) -> dict:
        mt = np.asarray(state.mol_type)
        alive = np.asarray(state.mol_alive)
        mov = ~(np.asarray(state.mol_frozen) |
                np.asarray(state.mol_adiabatic) |
                np.asarray(state.mol_target))
        return {t: int((~alive & mov & (mt == t)).sum())
                for t in self._insert_types}

    def _headroom_low(self) -> bool:
        if self.cfg.ensemble != const.ENSEMBLE_UVT or \
                not self._insert_types:
            return False
        thresh = max(8, int(self.cfg.corrtime) // 4)
        return any(v < thresh
                   for v in self._dead_counts(self.carry.state).values())

    def _grow_capacity(self, base_carry) -> None:
        """Rebuild state/engine with more insertion slots, continuing the
        chain from ``base_carry`` (RNG key, step count, acceptance stats,
        annealing temperature and cavity statistics carry over; energy,
        structure factors and the polarization cache are recomputed from
        scratch on the regrown state)."""
        st = base_carry.state
        name_of = {i: n for n, i in self.meta["species"].items()}
        mt = np.asarray(st.mol_type)
        alive = np.asarray(st.mol_alive)
        mov = ~(np.asarray(st.mol_frozen) | np.asarray(st.mol_adiabatic) |
                np.asarray(st.mol_target))
        extra = {}
        for t in self._insert_types:
            live_t = int((alive & mov & (mt == t)).sum())
            # geometric growth: headroom >= live count keeps the number
            # of regrowths O(log N); >= corrtime makes an in-chunk
            # saturation practically unreachable
            extra[name_of[t]] = max(live_t, int(self.cfg.corrtime), 64)
        self.state, self.meta = grow_mol_capacity(
            st, self.meta, extra, ensure_species=tuple(extra),
            # mixed-SCF Pallas tiles want atom capacity % 512 == 0
            pad_atoms_multiple=512 if self.flags.polar_mixed else 0)
        if not self.quiet:
            self.out.write(
                f"MC: molecule capacity grown to "
                f"{self.state.n_mol_slots} slots "
                f"({self.state.n_atom_slots} atom slots)\n")

        # rebuild the capacity-derived engine pieces (mirrors __init__)
        self.opts = capacity_opts(self.opts, self.flags, self.state)
        self.topology = topology(self.state)
        self.run_chunk = chain_mod.make_chunk_runner(
            self.flags, self.params, self.opts, self.cfg.corrtime,
            topology=self.topology, donate=self._donate)
        self.refresh = chain_mod.make_refresher(self.flags, self.params,
                                                self.opts)
        if self.sorbates is not None:
            # same species indices (grow_mol_capacity keeps the registry
            # order), so only the per-slot masks change; accumulated
            # statistics carry over
            self.sorbates.mol_type = np.asarray(self.state.mol_type)
            self.sorbates.movable = \
                ~np.asarray(self.state.mol_frozen) & \
                ~np.asarray(self.state.mol_adiabatic) & \
                ~np.asarray(self.state.mol_target)

        seed = self.cfg.preset_seed if self.cfg.preset_seed_on else 0
        fresh = chain_mod.init_carry(self.state, self.flags, self.params,
                                     self.opts, seed)
        self.carry = fresh._replace(
            key=base_carry.key, step=base_carry.step,
            stats=base_carry.stats, temperature=base_carry.temperature,
            cavity=base_carry.cavity)
        if self.mesh is not None:
            from .parallel import meshing
            self.carry = meshing.shard_chain_carry(self.carry, self.mesh)

    def _corrtime_io(self, step: int):
        obs = _obs_to_dict(self.carry.obs)
        T = float(self.carry.temperature)
        self.avg.update(obs, ensemble=self.cfg.ensemble,
                        temperature=self.cfg.temperature,
                        volume=float(self.carry.state.pbc.volume),
                        particle_mass=self._particle_mass(),
                        free_volume=self.cfg.free_volume,
                        fugacity=(self.cfg.fugacities[0]
                                  if self.cfg.fugacities else None),
                        pressure=self.cfg.pressure)
        if self.sorbates is not None:
            fug = (self.cfg.fugacities[0] if self.cfg.fugacities
                   else self.cfg.pressure)
            self.sorbates.update(
                np.asarray(self.carry.state.mol_alive),
                volume=float(self.carry.state.pbc.volume),
                frozen_mass=obs["frozen_mass"],
                total_mass=obs["total_mass"],
                free_volume=self.cfg.free_volume,
                pressure_or_fugacity=fug,
                temperature=self.cfg.temperature)
        if self.fp_energy:
            out_io.write_observables(self.fp_energy, step, obs, T)
        if self.fp_energy_csv:
            out_io.write_observables(self.fp_energy_csv, step, obs, T,
                                     csv=True)

    def run(self) -> AvgObservables:
        cfg = self.cfg

        # analysis mode: print the molecular polarizability tensor and end
        # the run, as the reference does from its first energy() call
        # (src/System.Energy.cpp:2601-2605 prints + throws exception_ok)
        if cfg.polarizability_tensor and cfg.polarization and \
                not cfg.polar_iterative:
            from .ops import polar as polar_mod
            polar_mod.print_polarizability_tensor(
                self.state, self.flags, self.params, self.out)
            return self.avg

        self.fp_energy = None
        self.fp_energy_csv = None
        if cfg.energy_output and cfg.energy_output != "/dev/null":
            self.fp_energy = out_io.open_energy_file(cfg.energy_output)
        if cfg.energy_output_csv and cfg.energy_output_csv != "/dev/null":
            self.fp_energy_csv = out_io.open_energy_file(
                cfg.energy_output_csv, csv=True)

        perf = out_io.PerformanceTimer(cfg.numsteps)

        # population histogram (src/System.Histogram.cpp)
        self.hist = None
        if cfg.calc_hist:
            self.hist = hist_io.PopulationHistogram(
                np.asarray(self.state.pbc.basis), cfg.hist_resolution)

        # frozen-lattice OpenDX (write_frozen, src/System.Output.cpp:85-116)
        if cfg.frozen_output and cfg.frozen_output != "/dev/null":
            with open(cfg.frozen_output, "w") as f:
                hist_io.write_frozen_dx(f, self.state, self.meta,
                                        cfg.max_bondlength)

        self._first_frame = True

        # initial-state output (setup_mpi, src/System.MonteCarlo.cpp:178-206)
        self._corrtime_io(0)
        if not self.quiet:
            self.out.write("MC: initial values:\n")
            self._display()

        step = 0
        accept_prev = np.zeros(7, dtype=np.int64)
        reject_prev = np.zeros(7, dtype=np.int64)
        while step < cfg.numsteps:
            n = min(cfg.corrtime, cfg.numsteps - step)
            if n != cfg.corrtime:
                runner = chain_mod.make_chunk_runner(
                    self.flags, self.params, self.opts, n,
                    topology=self.topology, donate=self._donate)
            else:
                runner = self.run_chunk
            prev_carry = self.carry
            self.carry, stats = runner(self.carry)
            if cfg.ensemble == const.ENSEMBLE_UVT and \
                    bool(np.asarray(stats.capacity_reject).any()):
                # an INSERT hit the capacity ceiling inside this chunk:
                # discard it, regrow from the pre-chunk state, and re-run
                # the window so the ceiling never biases the ensemble
                self._grow_capacity(prev_carry)
                continue
            # full recompute every corrtime: kills Delta-E drift (the
            # flag_all_pairs role) and refreshes observables exactly
            self.carry = self.refresh(self.carry)
            if self.mesh is not None:
                # refresh rebuilds the planes from scratch; re-pin them
                # to the mesh so the next chunk stays row-sharded
                from .parallel import meshing
                self.carry = meshing.shard_chain_carry(self.carry,
                                                       self.mesh)
            step += n

            acc = np.asarray(self.carry.stats.accept)
            rej = np.asarray(self.carry.stats.reject)
            ns = nodestats_from_counters(
                acc, rej, float(self.carry.stats.boltzmann_factor),
                polarization_iterations=float(
                    np.asarray(stats.polarization_iterations)[-1]),
                cavity_bias_probability=float(self.carry.cavity[0])
                if cfg.cavity_bias else 0.0)
            self.avg.update_nodestats(ns)
            accept_prev, reject_prev = acc, rej

            self._corrtime_io(step)
            if cfg.pqr_restart != "/dev/null":
                pqr_io.write_state_pqr(cfg.pqr_restart, self.carry.state,
                                       self.meta, wrapall=cfg.wrapall,
                                       long_output=cfg.long_output)
            if cfg.traj_output and cfg.traj_output != "/dev/null":
                traj_io.append_traj_frame(cfg.traj_output, self.carry.state,
                                          self.meta, step,
                                          wrapall=cfg.wrapall,
                                          long_output=cfg.long_output,
                                          first=self._first_frame)
                self._first_frame = False
            if self.hist is not None:
                st = self.carry.state
                self.hist.zero()
                self.hist.accumulate(np.asarray(st.mol_com()),
                                     np.asarray(st.mol_frozen) |
                                     ~np.asarray(st.mol_alive))
                self.hist.update_root()
                if cfg.histogram_output and \
                        cfg.histogram_output != "/dev/null":
                    with open(cfg.histogram_output, "w") as f:
                        self.hist.write_dx(f)
            if cfg.polarization:
                traj_io.write_dipoles(cfg.dipole_output, self.carry.state,
                                      first=(step <= cfg.corrtime))
                if cfg.field_output and cfg.field_output != "/dev/null":
                    self._write_field(step)
            if not self.quiet:
                perf.report(step, self.out)
                self._display()
            if step < cfg.numsteps and self._headroom_low():
                # proactive: regrow before the next chunk can plausibly
                # exhaust a species' dead slots (no discard needed here;
                # pointless after the final window — the rebuild costs a
                # full recompile + energy/cache init)
                self._grow_capacity(self.carry)

        if cfg.pqr_output != "/dev/null":
            pqr_io.write_state_pqr(cfg.pqr_output, self.carry.state,
                                   self.meta, wrapall=cfg.wrapall,
                                   long_output=cfg.long_output)
        if self.fp_energy:
            self.fp_energy.close()
        if self.fp_energy_csv:
            self.fp_energy_csv.close()
        pqr_io.drain()
        return self.avg

    def _write_field(self, step: int):
        """Per-molecule static+induced field log (write_field,
        src/System.Output.cpp:1184-1229).  E_static is recomputed at
        corrtime; the induced field is backed out of the converged dipoles
        (mu/alpha - E_static)."""
        import jax.numpy as jnp
        from .ops.pairwise import build_pairs
        from .ops import polar as polar_mod
        st = self.carry.state
        pt = build_pairs(st, self.flags)
        e_static = polar_mod.thole_field(st, pt, self.flags, self.params)
        alpha = np.asarray(self.state.polarizability)
        safe = np.where(alpha == 0.0, 1.0, alpha)
        mu = np.asarray(st.mu)
        e_ind = np.where(alpha[:, None] != 0.0,
                         mu / safe[:, None] - np.asarray(e_static), 0.0)
        traj_io.write_fields(self.cfg.field_output, st,
                             np.asarray(e_static), e_ind,
                             first=(step <= self.cfg.corrtime))

    def _display(self):
        out_io.display_averages(
            self.avg, temperature=float(self.carry.temperature),
            simulated_annealing=self.cfg.simulated_annealing,
            gwp=self.cfg.gwp, ensemble=self.cfg.ensemble,
            sorbate_count=(self.sorbates.count if self.sorbates else 1),
            polar_rrms=self.cfg.polar_rrms, out=self.out)
        if self.sorbates is not None:
            self.sorbates.display(
                self.out,
                frozen_mass=float(self.carry.obs.frozen_mass))


def run_input_file(path: str, quiet: bool = False):
    cfg = read_config(path)
    if cfg.ensemble == const.ENSEMBLE_PATH_INTEGRAL_NVT:
        from .mc.pi import PISimulation
        sim = PISimulation(cfg, quiet=quiet)
    elif cfg.ensemble == const.ENSEMBLE_NVT_GIBBS:
        from .mc.gibbs import GibbsSimulation
        sim = GibbsSimulation(cfg, quiet=quiet)
    else:
        sim = Simulation(cfg, quiet=quiet)
    return sim.run()
