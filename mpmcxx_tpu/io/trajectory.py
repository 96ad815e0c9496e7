"""Trajectory, dipole/field, and PI-frame writers.

* multi-frame PQR trajectory with CRYST1 + REMARK step headers
  (write_states, src/System.Output.cpp:661-787)
* per-molecule dipole and per-atom field logs in Debye / field units
  (write_dipole/write_field, src/System.Output.cpp:1096-1229)
* all-bead XYZ frames for PI runs (write_PI_frame,
  src/SimulationControl.PathIntegral.cpp:699-729)
"""

from __future__ import annotations

import numpy as np

from .. import constants as const
from .pqr import _cryst1, state_to_atoms_data


def append_traj_frame(path: str, state, meta, step: int,
                      wrapall: bool = True, long_output: bool = False,
                      first: bool = False) -> None:
    if path == "/dev/null" or not path:
        return
    data = state_to_atoms_data(state, meta, wrapall=wrapall)
    basis = np.asarray(state.pbc.basis)
    ext = bool(long_output) or bool(np.any(np.abs(basis) >= 100.0))
    with open(path, "w" if first else "a") as f:
        f.write(f"REMARK step={step}\n")
        f.write(_cryst1(basis))
        n = len(data["atomtype"])
        for i in range(n):
            x, y, z = data["pos"][i]
            line = ["ATOM  ", f"{i + 1:5d}",
                    f" {data['atomtype'][i]:<4.4s}",
                    f" {data['moleculetype'][i]:<3.3s} ",
                    f"{data['flag'][i]:<1.1s}",
                    f" {data['molecule_id'][i]:4d}   "]
            if ext:
                line.append(f"{x:11.6f} {y:11.6f} {z:11.6f} ")
            else:
                line.append(f"{x:8.3f}{y:8.3f}{z:8.3f}")
            for key in ("mass", "charge_e", "polarizability", "epsilon",
                        "sigma", "omega", "gwp_alpha", "c6", "c8", "c10",
                        "c9"):
                line.append(f" {data[key][i]:8.5f}")
            f.write("".join(line) + "\n")
        f.write("ENDMDL\n")


def write_dipoles(path: str, state, first: bool = False) -> None:
    """Per-molecule total induced dipole in Debye
    (write_dipole, src/System.Output.cpp:1132-1160)."""
    if path == "/dev/null" or not path:
        return
    mu = np.asarray(state.mu)
    mol_id = np.asarray(state.mol_id)
    M = state.n_mol_slots
    alive = np.asarray(state.mol_alive)
    frozen = np.asarray(state.mol_frozen)
    totals = np.zeros((M, 3))
    np.add.at(totals, mol_id, mu)
    with open(path, "w" if first else "a") as f:
        for m in range(M):
            if alive[m] and not frozen[m]:
                d = totals[m] / const.DEBYE2SKA
                f.write(f"{d[0]:f} {d[1]:f} {d[2]:f}\n")


def write_fields(path: str, state, e_static, e_induced,
                 first: bool = False) -> None:
    """Per-molecule total field E_static + E_induced
    (write_field, src/System.Output.cpp:1184-1229)."""
    if path == "/dev/null" or not path:
        return
    mol_id = np.asarray(state.mol_id)
    M = state.n_mol_slots
    alive = np.asarray(state.mol_alive)
    frozen = np.asarray(state.mol_frozen)
    tot = np.zeros((M, 3))
    np.add.at(tot, mol_id, np.asarray(e_static) + np.asarray(e_induced))
    with open(path, "w" if first else "a") as f:
        for m in range(M):
            if alive[m] and not frozen[m]:
                # internal fields carry E2REDUCED-scaled charge units;
                # the log prints e/A (write_field divides by E2REDUCED,
                # src/System.Output.cpp:1225 — an r5 parity check caught
                # this writer MULTIPLYING, an E2REDUCED^2 ~ 1.7e5 error)
                e = tot[m] / const.E2REDUCED
                f.write(f"{e[0]:f} {e[1]:f} {e[2]:f}\n")


class PIFrameWriter:
    """All-bead XYZ frames (write_PI_frame,
    src/SimulationControl.PathIntegral.cpp:699-729)."""

    def __init__(self, path: str):
        self.path = path
        self.frame = 1

    def write(self, stack, meta) -> None:
        if not self.path:
            return
        P = stack.pos.shape[0]
        alive = np.asarray(stack.mol_alive[0])[np.asarray(stack.mol_id[0])]
        idx = np.nonzero(alive)[0]
        n_sites = P * len(idx)
        mode = "w" if self.frame == 1 else "a"
        pos = np.asarray(stack.pos)
        with open(self.path, mode) as f:
            f.write(f"{n_sites}\nFrame: {self.frame}\n")
            for s in range(P):
                for a in idx:
                    f.write(f"{meta['atomtypes'][a]}     "
                            f"{pos[s, a, 0]:0.4f}     {pos[s, a, 1]:0.4f}"
                            f"     {pos[s, a, 2]:0.4f}\n")
        self.frame += 1
