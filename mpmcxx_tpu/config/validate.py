"""Option validation and default resolution.

Condenses the reference's check_system / check_mc_options /
check_io_files_options / check_polarization_options passes
(src/SimulationControl.cpp:1617-2785) into one pass: validate user input
with the same error conditions, resolve default filenames, and dispatch
fugacity equations of state.
"""

from __future__ import annotations

from .. import constants as const
from ..mc import fugacity as fug
from .parser import ConfigError
from .schema import SimConfig


def validate(cfg: SimConfig, n_systems: int = 1) -> SimConfig:
    ens = cfg.ensemble

    if ens in (const.ENSEMBLE_SURF, const.ENSEMBLE_SURF_FIT,
               const.ENSEMBLE_TE, const.ENSEMBLE_REPLAY):
        # vestigial in this edition (src/SimulationControl.h:117-121 stubs)
        raise ConfigError(
            f"ensemble {ens} is stubbed in this edition (as in the "
            "reference: runSimulation returns false for SURF/SURF_FIT/TE/"
            "REPLAY)")

    if not cfg.pqr_input:
        cfg.pqr_input = cfg.job_name + ".initial.pqr"

    # MC basics (check_mc_options, src/SimulationControl.cpp:1797-1845)
    if cfg.numsteps < 1:
        raise ConfigError("Improper number of steps specified.")
    if cfg.corrtime < 1:
        raise ConfigError("Improper correlation time specified.")
    if ens != const.ENSEMBLE_NVE and cfg.temperature <= 0.0:
        raise ConfigError("Invalid temperature specified.")
    if ens == const.ENSEMBLE_NVE and cfg.total_energy <= 0.0:
        raise ConfigError("NVE requires total_energy to be set.")

    if ens == const.ENSEMBLE_NPT:
        if cfg.pressure <= 0.0:
            raise ConfigError("invalid pressure set for NPT")

    if ens == const.ENSEMBLE_UVT:
        if cfg.user_fugacities:
            if cfg.pressure != 0.0:
                raise ConfigError("User defined fugacities are not "
                                  "compatible with pressure specification.")
        elif cfg.pressure <= 0.0:
            raise ConfigError("invalid pressure set for GCMC")
        else:
            n_eos = sum([cfg.h2_fugacity, cfg.co2_fugacity, cfg.ch4_fugacity,
                         cfg.n2_fugacity])
            if n_eos > 1:
                raise ConfigError("multiple fugacity EoS selected")
            if cfg.h2_fugacity:
                cfg.fugacities = [fug.h2_fugacity(cfg.temperature,
                                                  cfg.pressure)]
            elif cfg.co2_fugacity:
                cfg.fugacities = [fug.co2_fugacity(cfg.temperature,
                                                   cfg.pressure)]
            elif cfg.ch4_fugacity:
                cfg.fugacities = [fug.ch4_fugacity(cfg.temperature,
                                                   cfg.pressure)]
            elif cfg.n2_fugacity:
                cfg.fugacities = [fug.n2_fugacity(cfg.temperature,
                                                  cfg.pressure)]

    # PI checks (check_PI_options, src/SimulationControl.PathIntegral.cpp:
    # 552-606): Trotter number power of two >= 4; trial chain in [1, P-1]
    if ens == const.ENSEMBLE_PATH_INTEGRAL_NVT:
        P = n_systems
        if P < 4 or (P & (P - 1)) != 0:
            raise ConfigError(
                "Path integrals require a Trotter number (-P) that is a "
                "power of 2 and >= 4.")
        if not cfg.PI_trial_chain_length:
            raise ConfigError("PI_trial_chain_length must be set when using "
                              "Path Integral ensembles.")
        if cfg.PI_trial_chain_length >= P:
            raise ConfigError("PI_trial_chain_length must be in [1..P-1]")

    # Gibbs checks (check_Gibbs_options, src/SimulationControl.Gibbs.cpp:14)
    if ens == const.ENSEMBLE_NVT_GIBBS:
        if not cfg.pqr_input_B:
            cfg.pqr_input_B = cfg.pqr_input

    # spectre (check_spectre_options, src/SimulationControl.cpp:2176)
    if cfg.spectre:
        if ens != const.ENSEMBLE_NVT:
            raise ConfigError("SPECTRE algorithm requires ensemble nvt")
        if cfg.spectre_max_charge <= 0 or cfg.spectre_max_target <= 0:
            raise ConfigError("SPECTRE requires spectre_max_charge and "
                              "spectre_max_target > 0")

    # polarization option checks (src/SimulationControl.cpp:2606-2785)
    if cfg.polarization:
        if cfg.polar_iterative and cfg.polarizability_tensor:
            raise ConfigError("iterative polarizability tensor method not "
                              "implemented")
        if not cfg.polar_iterative and cfg.polar_zodid:
            raise ConfigError("ZODID and matrix inversion cannot both be "
                              "set")
        if cfg.polar_precision < 0.0:
            raise ConfigError("invalid polarization precision level")
        if cfg.polar_precision > 0 and cfg.polar_max_iter > 0:
            raise ConfigError("polar_precision and polar_max_iter are "
                              "mutually exclusive")
        if cfg.polar_iterative and cfg.polar_precision == 0.0 and \
                cfg.polar_max_iter == 0:
            raise ConfigError("must specify either polar_precision or "
                              "polar_max_iter")
        if cfg.polar_sor and cfg.polar_esor:
            raise ConfigError("cannot specify both SOR and ESOR")
        if (cfg.polar_sor or cfg.polar_esor) and cfg.polar_gamma == 0:
            raise ConfigError("SOR/ESOR require polar_gamma")

    # feynman-hibbs (check_feynman_hibbs_options,
    # src/SimulationControl.cpp:2473)
    if cfg.feynman_hibbs and not cfg.feynman_kleinert:
        if cfg.feynman_hibbs_order not in (2, 4):
            cfg.feynman_hibbs_order = 2

    # simulated annealing (src/SimulationControl.cpp:2520)
    if cfg.simulated_annealing:
        if not cfg.simulated_annealing_linear and \
                not (0.0 < cfg.simulated_annealing_schedule < 1.0):
            raise ConfigError("invalid simulated annealing schedule")
        if cfg.simulated_annealing_target < 0.0:
            raise ConfigError("invalid simulated annealing target")

    # histogram (check_hist_options, src/SimulationControl.cpp:2552)
    if cfg.calc_hist and cfg.hist_resolution <= 0.0:
        cfg.hist_resolution = 0.7

    # cavity
    if cfg.cavity_bias:
        if cfg.cavity_grid_size < 1:
            raise ConfigError("cavity_bias requires cavity_grid >= 1")
        if cfg.cavity_radius <= 0.0:
            raise ConfigError("cavity_bias requires cavity_radius > 0")

    # default output filenames (check_io_files_options,
    # src/SimulationControl.cpp:2196-2468)
    def default(name, suffix):
        v = getattr(cfg, name)
        if v.lower() == "off":
            setattr(cfg, name, "/dev/null")
        elif not v:
            setattr(cfg, name, cfg.job_name + suffix)

    default("pqr_restart", ".restart.pqr")
    default("pqr_output", ".final.pqr")
    default("energy_output", ".energy.dat")
    if cfg.calc_hist:
        default("histogram_output", ".histogram.dx")
    if cfg.polarization:
        default("dipole_output", ".dipole.dat")
        default("field_output", ".field.dat")
    if cfg.traj_output.lower() == "off":
        cfg.traj_output = "/dev/null"
    elif not cfg.traj_output:
        cfg.traj_output = cfg.job_name + ".traj.pqr"

    return cfg
