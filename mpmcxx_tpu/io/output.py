"""Run output: energy logs, stdout averages report, performance/ETA.

Reproduces the reference's output contract: the 12-column ``.energy.dat``
(+ csv) format (src/System.Output.cpp:29-62, 251-299), the per-corrtime
stdout averages report (display_averages, :304-567), and the sec/step + ETA
performance line (write_performance, :1234-1279).
"""

from __future__ import annotations

import sys
import time
from typing import TextIO

from .. import constants as const
from ..mc.averages import AvgObservables

ENERGY_HEADER = ("#step #energy #coulombic #rd #polar #vdw #kinetic "
                 "#kin_temp #N #spin_ratio #volume #core_temp\n")
ENERGY_HEADER_CSV = ("#step,#energy,#coulombic,#rd,#polar,#vdw,#kinetic,"
                     "#kin_temp,#N,#spin_ratio,#volume,#core_temp\n")


def open_energy_file(path: str, csv: bool = False) -> TextIO:
    f = open(path, "w")
    f.write(ENERGY_HEADER_CSV if csv else ENERGY_HEADER)
    f.flush()
    return f


def write_observables(f: TextIO, step: int, obs: dict, core_temp: float,
                      csv: bool = False) -> None:
    vals = [obs.get("energy", 0.0), obs.get("coulombic_energy", 0.0),
            obs.get("rd_energy", 0.0), obs.get("polarization_energy", 0.0),
            obs.get("vdw_energy", 0.0), obs.get("kinetic_energy", 0.0),
            obs.get("temperature", 0.0), obs.get("N", 0.0),
            obs.get("spin_ratio", 0.0), obs.get("volume", 0.0), core_temp]
    sep = "," if csv else " "
    f.write(f"{step}" + "".join(f"{sep}{v:f}" for v in vals) + "\n")
    f.flush()


def display_averages(avg: AvgObservables, *, sys_id: str = "",
                     temperature: float = 0.0,
                     simulated_annealing: bool = False, gwp: bool = False,
                     ensemble: int = const.ENSEMBLE_NVT,
                     sorbate_count: int = 1, polar_rrms: bool = False,
                     out: TextIO = sys.stdout) -> None:
    """Per-corrtime stdout report (display_averages,
    src/System.Output.cpp:304-567)."""
    w = out.write
    m = avg.mean
    e = avg.err
    if m["boltzmann_factor"] > 0.0:
        w(f"OUTPUT{sys_id}: BF = {m['boltzmann_factor']:.5g} "
          f"+- {e['boltzmann_factor']:.5g}\n")
    if m["acceptance_rate"] > 0.0:
        line = (f"OUTPUT{sys_id}: AR = {m['acceptance_rate']:.5f} "
                f"({m['acceptance_rate_insert']:.5f} I/ "
                f"{m['acceptance_rate_remove']:.5f} R/ "
                f"{m['acceptance_rate_displace']:.5f} D")
        if m["acceptance_rate_adiabatic"] > 0.0:
            line += f"/ {m['acceptance_rate_adiabatic']:.5f} A"
        if m["acceptance_rate_spinflip"] > 0.0:
            line += f"/ {m['acceptance_rate_spinflip']:.5f} S"
        if m["acceptance_rate_volume"] > 0.0:
            line += f"/ {m['acceptance_rate_volume']:.5f} V"
        if m["acceptance_rate_ptemp"] > 0.0:
            line += f"/ {m['acceptance_rate_ptemp']:.5f} PT"
        if m["acceptance_rate_beadPerturb"] > 0.0:
            line += f"/ {m['acceptance_rate_beadPerturb']:.5f} BEAD"
        w(line + ")\n")
    if simulated_annealing:
        w(f"OUTPUT{sys_id}: Simulated Annealing Temperature = "
          f"{temperature:.5f} K\n")
    if m["cavity_bias_probability"] > 0.0:
        w(f"OUTPUT{sys_id}: Cavity bias probability = "
          f"{m['cavity_bias_probability']:.5f} "
          f"+- {e['cavity_bias_probability']:.5f}\n")

    if gwp:
        w(f"OUTPUT{sys_id}: total energy = {m['energy']/const.EV2K:.5f} "
          f"+- {e['energy']/const.EV2K:.5f} eV\n")
    elif ensemble == const.ENSEMBLE_PATH_INTEGRAL_NVT:
        w(f"OUTPUT{sys_id}: total energy          = {m['energy']:.5f} "
          f"+- {e['energy']:.5f} K\n")
    else:
        w(f"OUTPUT{sys_id}: potential energy = {m['energy']:.5f} "
          f"+- {e['energy']:.5f} K\n")

    if m["coulombic_energy"] != 0.0:
        w(f"OUTPUT{sys_id}: electrostatic energy = "
          f"{m['coulombic_energy']:.5f} +- {e['coulombic_energy']:.5f} K\n")
    if m["rd_energy"] != 0.0:
        w(f"OUTPUT{sys_id}: repulsion/dispersion energy = "
          f"{m['rd_energy']:.5f} +- {e['rd_energy']:.5f} K\n")
    if m["polarization_energy"] != 0.0:
        line = (f"OUTPUT{sys_id}: polarization energy = "
                f"{m['polarization_energy']:.5f} "
                f"+- {e['polarization_energy']:.5f} K")
        if polar_rrms and e["dipole_rrms"] != 0.0:
            line += (f" (iterations = {m['polarization_iterations']:.1f} "
                     f"+- {e['polarization_iterations']:.1f} rrms = "
                     f"{m['dipole_rrms']:e} +- {e['dipole_rrms']:e})")
        elif m["polarization_iterations"] != 0.0:
            line += (f" (iterations = {m['polarization_iterations']:.1f} "
                     f"+- {e['polarization_iterations']:.1f})")
        w(line + "\n")
    if m["vdw_energy"] != 0.0:
        w(f"OUTPUT{sys_id}: (coupled-dipole) vdw energy = "
          f"{m['vdw_energy']:.5f} +- {e['vdw_energy']:.5f} K\n")
    if m["kinetic_energy"] > 0.0:
        w(f"OUTPUT{sys_id}: kinetic energy = {m['kinetic_energy']:.5f} "
          f"+- {e['kinetic_energy']:.5f} K\n")
        w(f"OUTPUT{sys_id}: kinetic temperature = {m['temperature']:.5f} "
          f"+- {e['temperature']:.5f} K\n")
    w(f"OUTPUT{sys_id}: N = {m['N']:.5f} +- {e['N']:.5f} molecules\n")
    if sorbate_count == 1:
        w(f"OUTPUT{sys_id}: density = {avg.density:.5f} "
          f"+- {avg.density_error:.5f} g/cm^3\n")
        if avg.pore_density != 0.0:
            w(f"OUTPUT{sys_id}: pore density = {avg.pore_density:.5f} "
              f"+- {avg.pore_density_error:.5f} g/cm^3\n")
        if avg.percent_wt > 0.0:
            w(f"OUTPUT{sys_id}: wt %% = {avg.percent_wt:.5f} "
              f"+- {avg.percent_wt_error:.5f} %%\n")
            w(f"OUTPUT{sys_id}: wt %% (ME) = {avg.percent_wt_me:.5f} "
              f"+- {avg.percent_wt_me_error:.5f} %%\n")
        if avg.excess_ratio != 0.0:
            w(f"OUTPUT{sys_id}: excess adsorption ratio = "
              f"{avg.excess_ratio:.5f} +- {avg.excess_ratio_error:.5f} "
              f"mg/g\n")
    if avg.qst != 0.0:
        w(f"OUTPUT{sys_id}: qst = {avg.qst:.5f} kJ/mol\n")
    if avg.heat_capacity != 0.0:
        w(f"OUTPUT{sys_id}: heat capacity = {avg.heat_capacity:.5f} "
          f"+- {avg.heat_capacity_error:.6f} kJ/mol K\n")
    if avg.compressibility != 0.0:
        w(f"OUTPUT{sys_id}: compressibility = {avg.compressibility:.6g} "
          f"+- {avg.compressibility_error:.6g} atm^-1\n")
    out.flush()


class PerformanceTimer:
    """sec/step + ETA reporter (write_performance,
    src/System.Output.cpp:1234-1279)."""

    def __init__(self, numsteps: int):
        self.start = time.time()
        self.last_time = self.start
        self.last_step = 0
        self.numsteps = numsteps

    def report(self, step: int, out: TextIO = sys.stdout) -> float:
        now = time.time()
        dsteps = step - self.last_step
        sec_step = (now - self.last_time) / dsteps if dsteps else 0.0
        remaining = sec_step * (self.numsteps - step)
        out.write(f"OUTPUT: Grand Total Steps: {step}... "
                  f"[ {sec_step:.4f} sec/step, ETA = {remaining/3600.0:.2f} "
                  f"hrs ]\n")
        out.flush()
        self.last_time = now
        self.last_step = step
        return sec_step
