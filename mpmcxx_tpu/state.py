"""Fixed-shape array state for a simulation system.

This replaces the reference's linked-list ``System``/``Molecule``/``Atom``
data model (src/System.h:32, src/Molecule.h:10, src/Atom.h:10) with a flat
SoA pytree sized to a static capacity:

* Atoms live in ``[A]`` arrays grouped contiguously by molecule; the slot
  assignment never changes under jit.  uVT insertion/removal flips the
  ``mol_alive`` mask instead of doing list surgery
  (replacing src/System.Pairs.cpp:53-152 entirely).
* Molecules live in ``[M]`` arrays; ``mol_id[A]`` maps atoms to molecules.
* Beads (path integrals), replicas, and Gibbs boxes add leading axes via
  ``jax.vmap`` / stacking — the state itself is single-system.

All statics (per-atom force-field parameters) are part of the pytree so a
jitted energy is a pure function of state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import constants as const
from .pbc import PBC


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Observables:
    """Mirror of observables_t (src/System.h:94-113)."""

    energy: jnp.ndarray = 0.0
    coulombic_energy: jnp.ndarray = 0.0
    rd_energy: jnp.ndarray = 0.0
    polarization_energy: jnp.ndarray = 0.0
    vdw_energy: jnp.ndarray = 0.0
    three_body_energy: jnp.ndarray = 0.0
    dipole_rrms: jnp.ndarray = 0.0
    kinetic_energy: jnp.ndarray = 0.0
    temperature: jnp.ndarray = 0.0
    volume: jnp.ndarray = 0.0
    N: jnp.ndarray = 0.0
    NU: jnp.ndarray = 0.0
    spin_ratio: jnp.ndarray = 0.0
    frozen_mass: jnp.ndarray = 0.0
    total_mass: jnp.ndarray = 0.0

    def potential(self):
        return (self.coulombic_energy + self.rd_energy +
                self.polarization_energy + self.vdw_energy +
                self.three_body_energy)

    @classmethod
    def zeros(cls):
        z = jnp.zeros(())
        return cls(**{f.name: z for f in dataclasses.fields(cls)})


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SystemState:
    """Complete dynamic + static per-system state as one pytree."""

    # --- dynamic ---
    pos: jnp.ndarray            # [A,3] atom positions (Angstrom)
    charge: jnp.ndarray         # [A] reduced units sqrt(K*A); dynamic for SPECTRE
    nuclear_spin: jnp.ndarray   # [M] int32 (PARA/ORTHO)
    mol_alive: jnp.ndarray      # [M] bool: molecule exists
    pbc: PBC
    mu: jnp.ndarray             # [A,3] induced dipoles (warm start for SCF)

    # --- static per-atom force-field params ---
    mass: jnp.ndarray           # [A] amu
    polarizability: jnp.ndarray # [A]
    epsilon: jnp.ndarray        # [A]
    sigma: jnp.ndarray          # [A]
    omega: jnp.ndarray          # [A]
    gwp_alpha: jnp.ndarray      # [A]
    c6: jnp.ndarray             # [A]
    c8: jnp.ndarray             # [A]
    c10: jnp.ndarray            # [A]
    c9: jnp.ndarray             # [A]
    frozen: jnp.ndarray         # [A] bool
    adiabatic: jnp.ndarray      # [A] bool
    spectre: jnp.ndarray        # [A] bool
    target: jnp.ndarray         # [A] bool
    gwp_spin: jnp.ndarray       # [A] bool

    # --- static topology ---
    mol_id: jnp.ndarray         # [A] int32 molecule index of each atom slot
    mol_frozen: jnp.ndarray     # [M] bool
    mol_adiabatic: jnp.ndarray  # [M] bool
    mol_spectre: jnp.ndarray    # [M] bool
    mol_target: jnp.ndarray     # [M] bool
    mol_mass: jnp.ndarray       # [M] amu (sum of atom masses)
    mol_type: jnp.ndarray       # [M] int32 species index
    rot_partfunc_g: jnp.ndarray # [M]
    rot_partfunc_u: jnp.ndarray # [M]

    # --- derived cache ---
    # [A] bool == mol_alive[mol_id], maintained by every mol_alive write
    # (replace() recomputes it as a safety net; mc.moves updates it with a
    # masked select).  The gather itself costs ~80 us per instance on TPU
    # and appeared twice per MC step — ~1.5% of the flagship move budget.
    aalive: jnp.ndarray

    @property
    def n_atom_slots(self) -> int:
        return self.pos.shape[0]

    @property
    def n_mol_slots(self) -> int:
        return self.mol_alive.shape[0]

    def atom_alive(self):
        """[A] bool: atom slot's molecule is alive (cached gather)."""
        return self.aalive

    def count_N(self):
        """Number of live movable molecules (src/System.cpp:909-931)."""
        movable = self.mol_alive & ~(self.mol_frozen | self.mol_adiabatic |
                                     self.mol_target)
        return jnp.sum(movable)

    def spin_ratio_sum(self):
        movable = self.mol_alive & ~(self.mol_frozen | self.mol_adiabatic |
                                     self.mol_target)
        return jnp.sum(jnp.where(
            movable & (self.nuclear_spin == const.NUCLEAR_SPIN_ORTHO), 1.0, 0.0))

    def mol_com(self):
        """[M,3] centers of mass (mass-weighted; src/System.cpp:1347-1374)."""
        alive = self.atom_alive()
        w = jnp.where(alive, self.mass, 0.0)
        num = jax.ops.segment_sum(w[:, None] * self.pos, self.mol_id,
                                  num_segments=self.n_mol_slots)
        den = jax.ops.segment_sum(w, self.mol_id,
                                  num_segments=self.n_mol_slots)
        return num / jnp.where(den == 0.0, 1.0, den)[:, None]

    def replace(self, **kw) -> "SystemState":
        if "mol_alive" in kw and "aalive" not in kw:
            # safety net: keep the per-atom cache coherent.  Hot paths
            # (mc.moves insert/remove) pass aalive explicitly as a masked
            # select; this fallback pays the gather once on cold paths.
            mol_id = kw.get("mol_id", self.mol_id)
            kw["aalive"] = kw["mol_alive"][mol_id]
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Builders (host-side, numpy)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AtomRecord:
    """One parsed PQR atom line (host side)."""
    atomtype: str = "X"
    moleculetype: str = "M"
    molecule_id: int = 1
    frozen: bool = False
    adiabatic: bool = False
    spectre: bool = False
    target: bool = False
    x: float = 0.0
    y: float = 0.0
    z: float = 0.0
    mass: float = 0.0
    charge: float = 0.0   # already in reduced units
    polarizability: float = 0.0
    epsilon: float = 0.0
    sigma: float = 0.0
    omega: float = 0.0
    gwp_alpha: float = 0.0
    c6: float = 0.0
    c8: float = 0.0
    c10: float = 0.0
    c9: float = 0.0


def build_state(atoms: list[AtomRecord],
                basis: np.ndarray,
                species_names: Optional[list[str]] = None,
                extra_mol_capacity: int = 0,
                template_moleculetype: Optional[str] = None,
                rot_partfunc: Optional[dict] = None,
                dtype=jnp.float64) -> tuple[SystemState, dict]:
    """Assemble a SystemState from parsed atom records.

    ``extra_mol_capacity`` > 0 reserves dead copies of the (single) sorbate
    template for uVT insertion headroom; a dict ``{moleculetype: count}``
    reserves per-species capacity (multi-sorbate mixtures insert into
    species-matched dead slots, mc.moves.find_dead_slot).  Returns
    (state, meta) where meta maps species names to indices and keeps
    per-slot atomtype strings for output writers.
    """
    atoms = list(atoms)
    if not atoms:
        raise ValueError("no atoms to build state from")

    # group into molecules by molecule_id in file order
    mols: list[list[AtomRecord]] = []
    cur_id = None
    for a in atoms:
        if a.molecule_id != cur_id:
            mols.append([])
            cur_id = a.molecule_id
        mols[-1].append(a)

    # species registry; an explicit species_names list pins the index
    # order FIRST so rebuilt states (capacity regrowth, replica restarts)
    # keep species indices stable even when the first-appearing species
    # changed — MCOptions.insert_species/type_fugacities bake the indices
    species = {}
    if species_names:
        for t in species_names:
            if t not in species:
                species[t] = len(species)
    for m in mols:
        t = m[0].moleculetype
        if t not in species:
            species[t] = len(species)

    # insertion headroom: replicate the last movable (non-frozen) molecule
    # of each requested species
    extra: list[list[AtomRecord]] = []
    if isinstance(extra_mol_capacity, dict):
        for mt, count in extra_mol_capacity.items():
            cand = [m for m in mols
                    if not m[0].frozen and m[0].moleculetype == mt]
            if not cand:
                raise ValueError(
                    f"no movable {mt} molecule to use as insertion template")
            extra.extend([cand[-1]] * count)
    elif extra_mol_capacity > 0:
        cand = [m for m in mols
                if not m[0].frozen and
                (template_moleculetype is None or
                 m[0].moleculetype == template_moleculetype)]
        if not cand:
            raise ValueError("no movable molecule to use as insertion template")
        extra = [cand[-1]] * extra_mol_capacity

    all_mols = mols + extra
    n_live = len(mols)

    A = sum(len(m) for m in all_mols)
    M = len(all_mols)

    f = lambda: np.zeros(A)
    b = lambda: np.zeros(A, dtype=bool)
    pos = np.zeros((A, 3))
    arr = {k: f() for k in ("mass", "charge", "polarizability", "epsilon",
                            "sigma", "omega", "gwp_alpha",
                            "c6", "c8", "c10", "c9")}
    flags = {k: b() for k in ("frozen", "adiabatic", "spectre", "target",
                              "gwp_spin")}
    mol_id = np.zeros(A, dtype=np.int32)
    atomtypes = []

    mol_flags = {k: np.zeros(M, dtype=bool)
                 for k in ("mol_frozen", "mol_adiabatic", "mol_spectre",
                           "mol_target")}
    mol_mass = np.zeros(M)
    mol_typ = np.zeros(M, dtype=np.int32)
    mol_alive = np.zeros(M, dtype=bool)
    rg = np.zeros(M)
    ru = np.zeros(M)

    i = 0
    for mi, m in enumerate(all_mols):
        mol_alive[mi] = mi < n_live
        mol_flags["mol_frozen"][mi] = m[0].frozen
        mol_flags["mol_adiabatic"][mi] = m[0].adiabatic
        mol_flags["mol_spectre"][mi] = m[0].spectre
        mol_flags["mol_target"][mi] = m[0].target
        mol_typ[mi] = species[m[0].moleculetype]
        if rot_partfunc and m[0].moleculetype in rot_partfunc:
            rg[mi], ru[mi] = rot_partfunc[m[0].moleculetype]
        for a in m:
            pos[i] = (a.x, a.y, a.z)
            arr["mass"][i] = a.mass
            arr["charge"][i] = a.charge
            arr["polarizability"][i] = a.polarizability
            arr["epsilon"][i] = a.epsilon
            arr["sigma"][i] = a.sigma
            arr["omega"][i] = a.omega
            arr["gwp_alpha"][i] = a.gwp_alpha
            arr["c6"][i] = a.c6
            arr["c8"][i] = a.c8
            arr["c10"][i] = a.c10
            arr["c9"][i] = a.c9
            flags["frozen"][i] = a.frozen
            flags["adiabatic"][i] = a.adiabatic
            flags["spectre"][i] = a.spectre
            flags["target"][i] = a.target
            flags["gwp_spin"][i] = a.gwp_alpha != 0.0
            mol_id[i] = mi
            atomtypes.append(a.atomtype)
            mol_mass[mi] += a.mass
            i += 1

    J = lambda x: jnp.asarray(x, dtype=dtype)
    state = SystemState(
        pos=J(pos),
        charge=J(arr["charge"]),
        nuclear_spin=jnp.zeros(M, dtype=jnp.int32),
        mol_alive=jnp.asarray(mol_alive),
        pbc=PBC.from_basis(J(np.asarray(basis, dtype=float))),
        mu=jnp.zeros((A, 3), dtype=dtype),
        mass=J(arr["mass"]),
        polarizability=J(arr["polarizability"]),
        epsilon=J(arr["epsilon"]),
        sigma=J(arr["sigma"]),
        omega=J(arr["omega"]),
        gwp_alpha=J(arr["gwp_alpha"]),
        c6=J(arr["c6"]),
        c8=J(arr["c8"]),
        c10=J(arr["c10"]),
        c9=J(arr["c9"]),
        frozen=jnp.asarray(flags["frozen"]),
        adiabatic=jnp.asarray(flags["adiabatic"]),
        spectre=jnp.asarray(flags["spectre"]),
        target=jnp.asarray(flags["target"]),
        gwp_spin=jnp.asarray(flags["gwp_spin"]),
        mol_id=jnp.asarray(mol_id),
        mol_frozen=jnp.asarray(mol_flags["mol_frozen"]),
        mol_adiabatic=jnp.asarray(mol_flags["mol_adiabatic"]),
        mol_spectre=jnp.asarray(mol_flags["mol_spectre"]),
        mol_target=jnp.asarray(mol_flags["mol_target"]),
        mol_mass=J(mol_mass),
        mol_type=jnp.asarray(mol_typ),
        rot_partfunc_g=J(rg),
        rot_partfunc_u=J(ru),
        aalive=jnp.asarray(np.asarray(mol_alive)[mol_id]),
    )
    meta = {
        "species": species,
        "atomtypes": atomtypes,
        "moleculetypes": [m[0].moleculetype for m in all_mols],
        "n_live_molecules": n_live,
    }
    return state, meta


def topology(state: SystemState) -> tuple[np.ndarray, np.ndarray]:
    """Per-molecule-slot (starts, natoms) int32 arrays for the
    topology-gather step variants (mc.chain.make_chunk_runner).  Slot
    layouts never change during a run (insert/remove only flip
    mol_alive), so this is computed once host-side."""
    mol_id = np.asarray(state.mol_id)
    counts = np.bincount(
        mol_id, minlength=state.n_mol_slots).astype(np.int32)
    starts = np.zeros(state.n_mol_slots, dtype=np.int32)
    for m in range(state.n_mol_slots):
        w = np.nonzero(mol_id == m)[0]
        starts[m] = w[0] if len(w) else 0
    return starts, counts


def state_to_records(state: SystemState, meta: dict,
                     atom_idx=None) -> list[AtomRecord]:
    """Atoms of a (possibly mutated) state back to host AtomRecords, in
    slot order — the bridge for capacity regrowth (grow_mol_capacity).
    Default selection is the live atoms (dead slots dropped);
    molecule_id values only delimit grouping."""
    mol_id = np.asarray(state.mol_id)
    alive = np.asarray(state.aalive)
    pos = np.asarray(state.pos)
    cols = {k: np.asarray(getattr(state, k))
            for k in ("mass", "charge", "polarizability", "epsilon",
                      "sigma", "omega", "gwp_alpha", "c6", "c8", "c10",
                      "c9", "frozen", "adiabatic", "spectre", "target")}
    if atom_idx is None:
        atom_idx = np.nonzero(alive)[0]
    out = []
    for a in atom_idx:
        m = int(mol_id[a])
        out.append(AtomRecord(
            atomtype=meta["atomtypes"][a],
            moleculetype=meta["moleculetypes"][m],
            molecule_id=m + 1,
            frozen=bool(cols["frozen"][a]),
            adiabatic=bool(cols["adiabatic"][a]),
            spectre=bool(cols["spectre"][a]),
            target=bool(cols["target"][a]),
            x=float(pos[a, 0]), y=float(pos[a, 1]), z=float(pos[a, 2]),
            mass=float(cols["mass"][a]), charge=float(cols["charge"][a]),
            polarizability=float(cols["polarizability"][a]),
            epsilon=float(cols["epsilon"][a]),
            sigma=float(cols["sigma"][a]), omega=float(cols["omega"][a]),
            gwp_alpha=float(cols["gwp_alpha"][a]),
            c6=float(cols["c6"][a]), c8=float(cols["c8"][a]),
            c10=float(cols["c10"][a]), c9=float(cols["c9"][a])))
    return out


def _pad_extra(state: SystemState, meta: dict, records, extra,
               pad_atoms_multiple: int):
    """Bump one species' headroom so the regrown ATOM capacity lands on
    a multiple of ``pad_atoms_multiple`` — the mixed-SCF Pallas tiles
    want the atom capacity a multiple of 512 (docs/PERF.md).  No-op for
    int extras or when no exact multiple is reachable (e.g. even
    per-molecule atom counts against 512's parity: the loop gives up
    after pad_atoms_multiple template molecules)."""
    if not pad_atoms_multiple or not isinstance(extra, dict) or not extra:
        return extra
    mt_names = meta["moleculetypes"]
    mol_id = np.asarray(state.mol_id)
    per_atom = {}
    for name in extra:
        m = next(i for i, nm in enumerate(mt_names) if nm == name)
        per_atom[name] = int((mol_id == m).sum())
    base_atoms = len(records) + sum(extra[n] * per_atom[n] for n in extra)
    name0 = next(iter(extra))
    s = max(per_atom[name0], 1)
    for k in range(pad_atoms_multiple):
        if (base_atoms + k * s) % pad_atoms_multiple == 0:
            out = dict(extra)
            out[name0] += k
            return out
    return extra


def grow_mol_capacity(state: SystemState, meta: dict, extra_mol_capacity,
                      ensure_species=(),
                      pad_atoms_multiple: int = 0
                      ) -> tuple[SystemState, dict]:
    """Rebuild a state with more dead insertion slots, preserving the live
    contents, the PBC (incl. any manual cutoff override / NPT-scaled
    basis), per-molecule nuclear spins, and per-atom dipoles.

    The reference has no molecule-capacity ceiling (inserts malloc,
    src/System.MonteCarlo.cpp:740-833); our SoA pytree is statically
    sized, so uVT runs whose equilibrium N outgrows the initial headroom
    regrow through this at corrtime boundaries (runner.Simulation).
    Species indices stay stable (build_state registers the existing
    registry first), so MCOptions.insert_species/type_fugacities and the
    SorbateTracker remain valid.

    ``ensure_species``: insertable species that must keep an insertion
    template even when their live count is currently zero — one dead
    exemplar of each is resurrected as a template record set and flipped
    back to dead after the rebuild."""
    records = state_to_records(state, meta)
    mol_alive = np.asarray(state.mol_alive)
    mol_id = np.asarray(state.mol_id)
    live_names = {meta["moleculetypes"][m]
                  for m in np.nonzero(mol_alive)[0]}
    appended = 0
    mol_frozen = np.asarray(state.mol_frozen)
    for name in ensure_species:
        if name in live_names:
            continue
        cand = [m for m in range(state.n_mol_slots)
                if meta["moleculetypes"][m] == name and not mol_alive[m]
                and not mol_frozen[m]]
        if not cand:
            raise ValueError(f"no template molecule for species {name}")
        records.extend(state_to_records(
            state, meta, atom_idx=np.nonzero(mol_id == cand[0])[0]))
        appended += 1

    rot = {}
    rg = np.asarray(state.rot_partfunc_g)
    ru = np.asarray(state.rot_partfunc_u)
    for m, name in enumerate(meta["moleculetypes"]):
        rot.setdefault(name, (float(rg[m]), float(ru[m])))
    new_state, new_meta = build_state(
        records, np.eye(3),  # placeholder basis; real PBC copied below
        species_names=list(meta["species"]),
        extra_mol_capacity=_pad_extra(state, meta, records,
                                      extra_mol_capacity,
                                      pad_atoms_multiple),
        rot_partfunc=rot)
    new_state = new_state.replace(pbc=state.pbc)

    # live molecules land at slots 0..n_live-1 in slot order: carry their
    # nuclear spins (spinflip state is per-slot, not rebuildable) and the
    # live atoms' converged dipoles across
    live_mols = np.nonzero(mol_alive)[0]
    ns = np.asarray(new_state.nuclear_spin).copy()
    ns[:len(live_mols)] = np.asarray(state.nuclear_spin)[live_mols]
    live_atoms = np.nonzero(np.asarray(state.aalive))[0]
    mu = np.asarray(new_state.mu).copy()
    mu[:len(live_atoms)] = np.asarray(state.mu)[live_atoms]
    alive_new = np.asarray(new_state.mol_alive).copy()
    if appended:
        # the resurrected templates are the LAST `appended` live slots
        n_live = new_meta["n_live_molecules"]
        alive_new[n_live - appended:n_live] = False
        new_meta["n_live_molecules"] = n_live - appended
    new_state = new_state.replace(nuclear_spin=jnp.asarray(ns),
                                  mu=jnp.asarray(mu),
                                  mol_alive=jnp.asarray(alive_new))
    return new_state, new_meta
